"""Scale-hardening operators: bucketed co-located joins and salted
skew joins.

Neither exists in the reference (its tables are KB-scale and its only
parallelism is one JVM per account, `airflow/dags/apify_dag.py:83-91`);
both are required equipment at 100 TB:

- **Bucketing** pre-shuffles a table ONCE at write time: two tables
  bucketed by the same key into the same bucket count join with NO
  exchange at read time (tests/test_scale.py pins the plan). For a fact
  table joined on the same key by many queries per day, this converts
  N query-time shuffles into one write-time shuffle.

- **Salting** splinters a hot key across ``n_salts`` sub-keys so one
  reducer doesn't receive the whole key's rows. AQE's skew-join split
  (on by default in the session factory) handles most sort-merge skew
  automatically; explicit salting remains the tool for broadcast-less
  joins against a REUSED exchange, and for stateful streaming keys
  where AQE can't help.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   path: str | None = None, mode: str = "overwrite") -> None:
    """Persist ``df`` hash-bucketed (and per-bucket sorted) by ``key``.
    Bucketing metadata lives in the session catalog, so subsequent scans
    report an output partitioning Catalyst can use to elide exchanges."""
    writer = (df.write.mode(mode)
              .bucketBy(buckets, key).sortBy(key)
              .format("parquet"))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salt_column(n_salts: int, *cols) -> F.Column:
    """Deterministic salt in [0, n_salts): hash of the row's columns —
    reproducible across runs (no rand()), spreads each hot key's rows
    across ``n_salts`` reducers."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_join(big: DataFrame, small: DataFrame, on: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join where ``big`` has skewed join-key frequencies: the big
    side gets a deterministic salt, the small side is replicated
    ``n_salts`` times (once per salt value), and the join key becomes
    (key, salt). Result set is identical to ``big.join(small, on, how)``;
    the shuffle of the hot key is split ``n_salts`` ways.

    Use when the small side is too big to broadcast yet small enough to
    replicate n_salts times; the salt count trades replication volume
    against reducer balance.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    non_key = [c for c in big.columns if c != on]
    b = big.withColumn("_salt", salt_column(n_salts, *[F.col(c) for c in non_key] or [F.col(on)]))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def interleave_bits(a, b, bits: int = 8):
    """Z-order (Morton) key over two pre-bucketed int columns in
    [0, 2^bits): bit i of ``a`` lands at position 2i, of ``b`` at 2i+1.
    Pure integer Column arithmetic — stays in codegen.

    Sorting/range-partitioning by this key clusters the layout along
    BOTH dimensions at once: a range predicate on EITHER column prunes
    row groups (min/max stats stay tight in both), where a plain sort
    clusters one dimension and randomizes the other. The standard
    multi-dimensional layout for fact tables queried along several
    axes (the Delta OPTIMIZE ZORDER BY semantics, as plain columns)."""
    out = F.lit(0)
    one = F.lit(1)
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(one), 2 * i))
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(one), 2 * i + 1))
    return out
