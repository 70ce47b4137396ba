"""Structural properties of the retrieval layer (BM25 consumers):
MMR diversification, Rocchio feedback, and the NB classifier's
conservation laws. Value-level correctness is the DuckDB oracle's job
(tools/check_correctness.py); these pin the invariants a hash compare
can't express — set membership, monotonicity, mass conservation."""

from __future__ import annotations

from datalake_project_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def test_mmr_picks_k_distinct_pool_members(spark):
    reg = load_all()
    picks = reg["q_retrieval_mmr"].fn(spark, SF).collect()
    from datalake_project_spark.queries.retrieval import MMR_K, MMR_POOL

    assert [r["step"] for r in sorted(picks, key=lambda r: r["step"])] \
        == list(range(1, MMR_K + 1))
    ids = [r["doc_id"] for r in picks]
    assert len(set(ids)) == MMR_K  # no repeats: selected set grows

    # every pick comes from the relevance-ranked candidate pool, and
    # pick 1 IS the relevance argmax (margin == its rel)
    from pyspark.sql import functions as F

    from datalake_project_spark.queries.retrieval import _bm25_scores  # noqa: F401

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert set(ids) <= {r["vec_id"] for r in e.collect()}

    # margins are rel - max-sim of two cosines: bounded by [-2, 2]
    # (a later margin CAN exceed the first pick's rel when the chosen
    # set is anti-correlated with a candidate, so no ordering claim)
    assert all(-2.0 <= r["margin"] <= 2.0 for r in picks)
    first = next(r for r in picks if r["step"] == 1)
    assert -1.0 <= first["margin"] <= 1.0  # step 1 is a plain cosine


def test_rocchio_topk_is_sorted_and_distinct(spark):
    reg = load_all()
    rows = reg["q_retrieval_rocchio"].fn(spark, SF).collect()
    from datalake_project_spark.queries.retrieval import ROCCHIO_K

    assert len(rows) == ROCCHIO_K
    assert len({r["doc_id"] for r in rows}) == ROCCHIO_K
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(-1.0 <= s <= 1.0 for s in scores)  # cosine range


def test_nb_langid_conserves_documents(spark):
    reg = load_all()
    conf = reg["q_text_nb_langid"].fn(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    # every document is classified exactly once, into a known class
    assert sum(r["n_docs"] for r in conf) == d.count()
    assert {r["actual"] for r in conf} <= langs
    assert {r["predicted"] for r in conf} <= langs
