"""Frequency-sketch operators: distributed Misra-Gries heavy hitters
with an exact recount.

The 100 TB problem: "which terms occur in more than 1/phi_inv of the
corpus" normally needs a full (term, count) shuffle — vocabulary-sized,
fine — but building frequency-cap / stopword lists over RAW token
streams (trillions of instances, adversarial vocab like URLs or hashes)
wants a bounded-memory first pass. Misra-Gries gives it:

- each partition keeps at most ``k`` counters (batched MG merge: add a
  batch's counts, then subtract the (|d|-k)-th smallest count from all
  and drop non-positives — the classic mergeable-summaries compaction);
- any item with partition-local frequency > n_p/(k+1) survives locally,
  and any item with GLOBAL frequency >= N/phi_inv has local frequency
  >= n_p/phi_inv in at least one partition (pigeonhole on proportions),
  so with k+1 > phi_inv the union of per-partition candidates is a
  PROVEN SUPERSET of the true phi-heavy hitters;
- an exact recount of the (bounded, broadcastable) candidate set via a
  semi-join then yields exact counts — the approximation is confined to
  the pruning step and can only admit extra candidates, never lose one.

So the operator's output is EXACT (integer-for-integer oracle-checkable)
while its memory is O(k) per partition and its shuffle is
O(candidates), not O(vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition batched Misra-Gries: one row per surviving
    candidate value of ``col`` (superset of items with local frequency
    > n_p/(k+1)); at most ``k`` rows per partition."""

    def mg(batches):
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for term, c in pdf[col].value_counts().items():
                counts[term] = counts.get(term, 0) + int(c)
            if len(counts) > k:
                vals = sorted(counts.values())
                dec = vals[len(counts) - k - 1]
                counts = {t: c - dec for t, c in counts.items() if c > dec}
        yield pd.DataFrame({col: list(counts.keys())})

    return df.select(col).mapInPandas(mg, f"{col} string")


def heavy_hitters(df: DataFrame, col: str, phi_inv: int,
                  k: int | None = None) -> DataFrame:
    """Exact values+counts of every item with frequency*phi_inv >= N.

    ``k`` defaults to 4*phi_inv (the guarantee needs only k+1 > phi_inv;
    the margin keeps candidates exact under batched-merge slack). The
    filter is integer arithmetic on both engine and oracle sides, so
    results hash bit-identically."""
    if k is None:
        k = 4 * phi_inv
    if k <= phi_inv:
        raise ValueError("k must exceed phi_inv for the superset guarantee")
    cands = mg_candidates(df, col, k).distinct()
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        df.join(F.broadcast(cands), col, "left_semi")
        .groupBy(col).agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") * phi_inv >= F.col("n_total"))
        .select(col, "n_occurrences")
    )
