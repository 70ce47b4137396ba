"""The BPE merge fold is the subtlest logic in the engine (greedy
left-to-right semantics expressed as a string fold): verify it against a
reference Python implementation EXHAUSTIVELY over an adversarial
alphabet — one that contains the merged token itself ('ab'), so
tail-collision cases are covered — in a single Spark job."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference greedy left-to-right BPE merge."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_merge_fold_matches_reference_exhaustively(spark):
    from datalake_project_spark.queries.substrings import _apply_merge

    alphabet = ["a", "b", "ab", "ba"]
    pairs = [("a", "b"), ("a", "a"), ("ab", "a"), ("b", "ab"), ("ab", "ab")]
    cases = []
    for n in range(1, 5):
        for seq in itertools.product(alphabet, repeat=n):
            cases.append(list(seq))
    # one DataFrame per merge pair; one job each (5 jobs total)
    for a, b in pairs:
        df = spark.createDataFrame(
            [(i, " ".join(seq)) for i, seq in enumerate(cases)],
            "case_id long, syms string")
        got = {r.case_id: r.syms
               for r in _apply_merge(df, a, b).withColumnRenamed(
                   "syms", "syms").collect()}
        for i, seq in enumerate(cases):
            exp = " ".join(_py_merge(seq, a, b))
            assert got[i] == exp, (seq, a, b, got[i], exp)


def test_heavy_hitters_guarantee_randomized(spark):
    """Misra-Gries + exact recount == naive exact heavy hitters, under
    seeded random zipf-ish data across partitions with k barely above
    phi_inv — the regime where compaction churns hardest."""
    import collections
    import random

    from datalake_project_spark.operators.sketches import heavy_hitters

    rng = random.Random(42)
    for trial in range(3):
        rows = []
        for i in range(40):  # 40 distinct items, zipf-ish
            rows += [(f"t{i}",)] * rng.randint(1, 200 // (i + 1) + 1)
        rng.shuffle(rows)
        exact = collections.Counter(r[0] for r in rows)
        n = len(rows)
        phi_inv = 12
        expect = {t: c for t, c in exact.items() if c * phi_inv >= n}
        df = spark.createDataFrame(rows, "w string").repartition(5)
        got = {r.w: r.n_occurrences
               for r in heavy_hitters(df, "w", phi_inv=phi_inv,
                                      k=phi_inv + 3).collect()}
        assert got == expect, (trial, got, expect)


def test_merge_cache_hits_and_invalidates(spark, tmp_path):
    """The fixture-keyed merge cache: same fixture => cached result
    (no retraining), regenerated fixture (new mtime) => stale entry
    dropped and retrained."""
    import os

    from datalake_project_spark.queries.substrings import _learn_bpe_merges
    from datalake_project_spark.scratch import scratch_dir

    docs = spark.createDataFrame(
        [(i, "aa bb aa bb cc", "en", "s", 14) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long")
    docs.coalesce(1).write.mode("overwrite") \
        .parquet(f"{tmp_path}/documents.parquet")

    m1 = _learn_bpe_merges(spark, str(tmp_path), 2)
    m2 = _learn_bpe_merges(spark, str(tmp_path), 2)   # cache hit
    assert m1 == m2 and len(m1) == 2

    root = scratch_dir("bpe", str(tmp_path))

    def cache_entries():
        # ignore the .src provenance marker scratch_dir writes (round 5)
        return [f for f in os.listdir(root) if not f.startswith(".")]

    assert len(cache_entries()) == 1

    # regenerate the fixture => different (size, mtime) key
    docs2 = spark.createDataFrame(
        [(i, "xx yy xx yy zz", "en", "s", 14) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long")
    docs2.coalesce(1).write.mode("overwrite") \
        .parquet(f"{tmp_path}/documents.parquet")
    os.utime(f"{tmp_path}/documents.parquet",
             (os.path.getmtime(f"{tmp_path}/documents.parquet") + 5,) * 2)

    m3 = _learn_bpe_merges(spark, str(tmp_path), 2)
    assert m3 != m1                       # retrained on the new corpus
    assert len(cache_entries()) == 1      # stale entry evicted
