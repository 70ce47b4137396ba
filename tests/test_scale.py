"""Scale-hardening operators: bucketed joins must elide the exchange;
salted joins must match unsalted results while splitting hot keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_project_spark.operators.scale import (
    bucketed, salt_column, salted_join, write_bucketed,
)
from datalake_project_spark.plans import exchange_count
from tests.conftest import rows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet") \
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, path=str(base / "o"))
    write_bucketed(lineitem, "lineitem_b", "l_orderkey", 8, path=str(base / "l"))
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed by the join key into the same bucket count:
    the sort-merge join consumes the bucket layout — ZERO exchanges
    (query-time shuffle paid once at write time)."""
    ot, lt = bucketed_tables
    j = (bucketed(spark, lt).hint("merge")
         .join(bucketed(spark, ot),
               F.col("l_orderkey") == F.col("o_orderkey"))
         .groupBy("o_orderpriority")
         .agg(F.sum("l_quantity").alias("qty")))
    # the join itself adds no exchange; only the group-by shuffles
    assert exchange_count(j) == 1


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    ot, lt = bucketed_tables
    got = (bucketed(spark, lt)
           .join(bucketed(spark, ot), F.col("l_orderkey") == F.col("o_orderkey"))
           .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
    exp = (spark.read.parquet(f"{SF}/lineitem.parquet")
           .join(spark.read.parquet(f"{SF}/orders.parquet"),
                 F.col("l_orderkey") == F.col("o_orderkey"))
           .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
    assert rows(got) == rows(exp)


def _skewed(spark):
    """90% of rows share one hot key."""
    import itertools
    data = [(1 if i % 10 else i, f"v{i}") for i in range(2000)]
    big = spark.createDataFrame(data, "k long, payload string")
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(200)],
                                  "k long, label string")
    return big, small


def test_salted_join_matches_plain(spark):
    big, small = _skewed(spark)
    got = salted_join(big, small, on="k", n_salts=8)
    exp = big.join(small, "k")
    assert rows(got.select("k", "payload", "label")) == \
        rows(exp.select("k", "payload", "label"))


def test_salted_left_join_matches_plain(spark):
    big, small = _skewed(spark)
    got = salted_join(big, small.where(F.col("k") < 50), on="k",
                      n_salts=4, how="left")
    exp = big.join(small.where(F.col("k") < 50), "k", "left")
    assert rows(got.select("k", "payload", "label")) == \
        rows(exp.select("k", "payload", "label"))


def test_salt_spreads_hot_key(spark):
    big, _ = _skewed(spark)
    n = (big.where(F.col("k") == 1)
         .select(salt_column(8, F.col("payload")).alias("s"))
         .select(F.countDistinct("s").alias("n")).first()["n"])
    assert n == 8  # the hot key's rows now span all 8 sub-keys


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join is the runtime complement of explicit salting: with
    neither side broadcastable, the optimizer detects the oversized
    post-shuffle partition of the hot key and splits it into multiple
    tasks (OptimizeSkewedJoin), with results unchanged. Thresholds are
    shrunk so the toy hot key lands in the same decision regime a
    multi-GB skewed partition hits with production defaults."""
    from datalake_project_spark.plans.introspect import final_plan

    conf = spark.conf
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: conf.get(k, None) for k in keys}
    try:
        for k, v in keys.items():
            conf.set(k, v)
        big, small = _skewed(spark)
        # pad the hot rows so the skewed partition crosses the byte threshold
        big = big.withColumn("pad", F.repeat(F.lit("x"), 200))
        j = big.join(small, "k")
        plan = final_plan(j)  # executes; AQE decides from runtime sizes
        assert "skew=true" in plan
        # semantics unchanged under the split
        assert j.count() == big.hint("merge").join(small, "k").count()
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_ivf_cells_partition_prune(spark, tmp_path):
    """The IVF storage story: candidates written partitionBy(cell) make an
    n-probe query a partition-PRUNED scan — the cell predicate runs at
    file-listing time, touching n_probe/n_clusters of the directories."""
    from datalake_project_spark.plans import partition_filters

    e = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .withColumn("cell", (F.col("vec_id") % 8).cast("int"))
    path = str(tmp_path / "ivf")
    e.write.mode("overwrite").partitionBy("cell").parquet(path)

    probe = spark.read.parquet(path).where(F.col("cell").isin(2, 5))
    pf = partition_filters(probe)
    assert pf and "cell" in pf[0]
    assert probe.count() == e.where(F.col("cell").isin(2, 5)).count()
    # and non-partition predicates do NOT appear as partition filters
    plain = spark.read.parquet(path).where(F.col("vec_id") < 10)
    assert all("vec_id" not in f for f in partition_filters(plain))


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: a year-partitioned fact joined to a
    FILTERED dimension prunes fact partitions at RUNTIME from the dim's
    join keys — the subquery filter appears in the fact scan's partition
    filters even though no literal year predicate exists on the fact.
    This is the mechanism that makes star joins over a date-partitioned
    100 TB fact read only the qualifying partitions."""
    from datalake_project_spark.plans.introspect import simple_plan

    fact_path = str(tmp_path / "fact")
    (spark.read.parquet(f"{SF}/orders.parquet")
     .withColumn("yr", F.year("o_orderdate"))
     .write.mode("overwrite").partitionBy("yr").parquet(fact_path))
    fact = spark.read.parquet(fact_path)

    years = [(y, "window") if y in (1995, 1996) else (y, "other")
             for y in range(1992, 1999)]
    dim = spark.createDataFrame(years, "yr int, tag string")

    j = (fact.join(dim.where(F.col("tag") == "window"), "yr")
         .agg(F.sum("o_totalprice").alias("s"), F.count(F.lit(1)).alias("n")))
    plan = simple_plan(j)
    assert "dynamicpruning" in plan.lower()

    expect = (fact.where(F.col("yr").isin(1995, 1996))
              .agg(F.sum("o_totalprice").alias("s"),
                   F.count(F.lit(1)).alias("n")).first())
    got = j.first()
    assert got["n"] == expect["n"] and got["s"] == pytest.approx(expect["s"])
