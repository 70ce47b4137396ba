"""Corpus-assembly operators: deterministic split and weighted mixing."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_project_spark.queries.corpus import mix_filter, split_assign
from tests.conftest import rows


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"))


def test_split_is_deterministic_and_total(spark):
    d = _docs(spark)
    a = rows(split_assign(d, "doc_id").select("doc_id", "split"))
    b = rows(split_assign(d.repartition(7), "doc_id").select("doc_id", "split"))
    assert a == b, "assignment must not depend on partitioning"
    splits = {s for _, s in a}
    assert splits == {"train", "val", "test"}
    assert len(a) == 400, "every doc lands in exactly one split"


def test_split_fractions_near_nominal(spark):
    counts = {r["split"]: r["n"] for r in
              split_assign(_docs(spark, 4000), "doc_id")
              .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 0.75 <= counts["train"] / 4000 <= 0.85
    assert 0.06 <= counts["val"] / 4000 <= 0.14


def test_split_stable_under_corpus_growth(spark):
    """Adding new docs never flips an existing doc's split."""
    small = split_assign(_docs(spark, 100), "doc_id")
    big = split_assign(_docs(spark, 400), "doc_id")
    overlap = rows(big.where(F.col("doc_id") < 100).select("doc_id", "split"))
    assert overlap == rows(small.select("doc_id", "split"))


def test_split_salt_reshuffles(spark):
    d = _docs(spark)
    a = dict(rows(split_assign(d, "doc_id").select("doc_id", "split")))
    b = dict(rows(split_assign(d, "doc_id", salt=":other:1")
                  .select("doc_id", "split")))
    assert any(a[k] != b[k] for k in a), "a new salt must move some docs"


def test_mix_weight_one_keeps_all_and_subset_nesting(spark):
    d = _docs(spark)
    kept = mix_filter(d, "doc_id", "source",
                      {"src0": 1.0, "src1": 0.5}, default=0.1)
    per_src = {r["source"]: r["n"] for r in
               kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_src["src0"] == 100, "weight 1.0 keeps every row"
    assert 0 < per_src.get("src1", 0) < 100
    assert per_src.get("src2", 0) < per_src["src1"], \
        "default 0.1 keeps fewer than weight 0.5"
    # same salt => a lower weight keeps a SUBSET (nested thresholds)
    kept_lo = mix_filter(d, "doc_id", "source",
                         {"src0": 1.0, "src1": 0.25}, default=0.1)
    ids_hi = {r["doc_id"] for r in kept.where("source='src1'").collect()}
    ids_lo = {r["doc_id"] for r in kept_lo.where("source='src1'").collect()}
    assert ids_lo <= ids_hi


def test_split_and_mix_plans_are_shuffle_free(spark):
    """Both operators must stay map-only: no Exchange in the plan."""
    d = _docs(spark)
    for df in (split_assign(d, "doc_id"),
               mix_filter(d, "doc_id", "source", {"src0": 0.5}, 0.1)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
