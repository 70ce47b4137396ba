"""Spark Declarative Pipelines (pyspark.pipelines) executed locally.

The managed `spark-pipelines` runner needs Spark Connect + grpcio
(absent here); the declaration layer doesn't. These tests define a
dataflow graph with the REAL SDP decorators, capture it through the
official registration contract, and execute it with the local
interpreter (plans/sdp_local.py) — declaration-order independence,
materialization, temp-view scoping, and loud failure modes."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from datalake_project_spark.plans.sdp_local import (
    LocalGraphRegistry,
    build_graph,
    run_pipeline,
)

SF = "/root/testdata/sf0.001"


def _define_reference_dataflow(spark, sf_dir):
    """The reference's DAG shape (filter -> enrich -> aggregate) as SDP
    definitions, DELIBERATELY declared leaves-first to prove the
    interpreter discovers order instead of trusting declaration order."""
    from pyspark.pipelines import materialized_view, temporary_view

    def define():
        @materialized_view(name="nation_revenue")
        def nation_revenue():
            n = spark.read.parquet(f"{sf_dir}/nation.parquet")
            return (spark.table("enriched_orders")
                    .join(F.broadcast(n),
                          F.col("c_nationkey") == F.col("n_nationkey"))
                    .groupBy("n_name")
                    .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                         F.count(F.lit(1)).alias("n_orders")))

        @materialized_view(name="enriched_orders",
                           partition_cols=["o_orderpriority"])
        def enriched_orders():
            c = spark.read.parquet(f"{sf_dir}/customer.parquet")
            return (spark.table("filtered_orders")
                    .join(c, F.col("o_custkey") == F.col("c_custkey"))
                    .select("o_orderkey", "o_totalprice", "o_orderpriority",
                            "c_custkey", "c_nationkey"))

        @temporary_view(name="filtered_orders")
        def filtered_orders():
            return (spark.read.parquet(f"{sf_dir}/orders.parquet")
                    .where(F.col("o_orderstatus") == "F"))

    return define


def test_sdp_graph_runs_out_of_order_and_materializes(spark, tmp_path):
    define = _define_reference_dataflow(spark, SF)
    registry = build_graph(define)
    assert {f.target for f in registry.flows} == {
        "nation_revenue", "enriched_orders", "filtered_orders"}

    storage = str(tmp_path / "sdp")
    results = run_pipeline(spark, registry, storage)

    # Parity with the directly-declared plan.
    o = spark.read.parquet(f"{SF}/orders.parquet").where(
        F.col("o_orderstatus") == "F")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    n = spark.read.parquet(f"{SF}/nation.parquet")
    want = (o.join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders")))
    got = {tuple(r) for r in results["nation_revenue"].collect()}
    assert got == {tuple(r) for r in want.collect()}

    # Materialized views hit storage (partitioned as declared); temp
    # views don't.
    assert os.path.isdir(os.path.join(storage, "nation_revenue"))
    parts = os.listdir(os.path.join(storage, "enriched_orders"))
    assert any(p.startswith("o_orderpriority=") for p in parts)
    assert not os.path.exists(os.path.join(storage, "filtered_orders"))

    # All targets resolvable as session views downstream of the run.
    assert spark.table("nation_revenue").count() == want.count()
    for v in ("nation_revenue", "enriched_orders", "filtered_orders"):
        spark.catalog.dropTempView(v)


def test_sdp_missing_upstream_fails_loudly(spark, tmp_path):
    from pyspark.pipelines import materialized_view

    def define():
        @materialized_view(name="orphan")
        def orphan():
            return spark.table("never_defined_upstream")

    registry = build_graph(define)
    with pytest.raises(RuntimeError, match="no progress"):
        run_pipeline(spark, registry, str(tmp_path / "sdp"))


def test_sdp_duplicate_output_and_multi_flow_rejected(spark):
    from pyspark.pipelines import materialized_view

    def define_dup():
        @materialized_view(name="dup")
        def a():
            return spark.range(1)

        @materialized_view(name="dup")
        def b():
            return spark.range(2)

    with pytest.raises((ValueError, NotImplementedError)):
        build_graph(define_dup)


def test_sdp_managed_runner_gated():
    """The real spark-pipelines runner requires grpcio (Spark Connect);
    document the environment gap the same way the protobuf-gated
    transformWithStateInPandas test does."""
    try:
        import grpc  # noqa: F401
    except ImportError:
        pytest.skip("grpcio not installed: spark-pipelines (Spark "
                    "Connect) runner unavailable; local interpreter "
                    "covers the declaration semantics")


def test_sdp_streaming_table_append_flows(spark, tmp_path):
    """create_streaming_table + two append_flows: each flow drains its
    source with availableNow under its own checkpoint into the shared
    table; a downstream materialized view aggregates the union; a
    SECOND run re-drains incrementally (checkpointed offsets — old rows
    not re-ingested) and picks up newly arrived source files."""
    import json as _json

    from pyspark.pipelines import (
        append_flow, create_streaming_table, materialized_view,
    )

    src_a = tmp_path / "src_a"
    src_b = tmp_path / "src_b"
    src_a.mkdir(), src_b.mkdir()
    (src_a / "p0.json").write_text(_json.dumps({"k": "a", "v": 1}))
    (src_b / "p0.json").write_text(_json.dumps({"k": "b", "v": 10}))

    def define():
        create_streaming_table(name="raw_rows", schema="k string, v long")

        @append_flow(target="raw_rows", name="from_a")
        def from_a():
            return (spark.readStream.schema("k string, v long")
                    .json(str(src_a)))

        @append_flow(target="raw_rows", name="from_b")
        def from_b():
            return (spark.readStream.schema("k string, v long")
                    .json(str(src_b)))

        @materialized_view(name="totals")
        def totals():
            from pyspark.sql import functions as F
            return (spark.table("raw_rows").groupBy("k")
                    .agg(F.sum("v").alias("total")))

    registry = build_graph(define)
    storage = str(tmp_path / "sdp")
    res = run_pipeline(spark, registry, storage)
    assert {tuple(r) for r in res["totals"].collect()} == {("a", 1),
                                                           ("b", 10)}

    # Late arrivals: only the new files flow on the next run.
    (src_a / "p1.json").write_text(_json.dumps({"k": "a", "v": 2}))
    res2 = run_pipeline(spark, build_graph(define), storage)
    assert {tuple(r) for r in res2["totals"].collect()} == {("a", 3),
                                                            ("b", 10)}
    for v in ("raw_rows", "totals"):
        spark.catalog.dropTempView(v)


def test_sdp_batch_flow_to_streaming_target_rejected(spark, tmp_path):
    from pyspark.pipelines import append_flow, create_streaming_table

    def define():
        create_streaming_table(name="st", schema="x long")

        @append_flow(target="st", name="oops")
        def oops():
            return spark.range(3).withColumnRenamed("id", "x")

    with pytest.raises(TypeError, match="batch DataFrame"):
        run_pipeline(spark, build_graph(define), str(tmp_path / "sdp"))
