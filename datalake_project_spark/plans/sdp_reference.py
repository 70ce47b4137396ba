"""The reference dataflow declared as a Spark Declarative Pipeline.

The reference schedules three script stages through Airflow
(`airflow/dags/apify_dag.py:52-91`: ingest -> spark transform ->
mirror). This module states the same filter -> enrich -> aggregate
shape in SDP terms (`pyspark.pipelines` decorators) so it runs under
EITHER executor: the managed `spark-pipelines` runner (where Spark
Connect + grpcio exist) or this repo's local interpreter
(`plans.sdp_local`, `python -m datalake_project_spark sdp`).

Declarations are deliberately leaves-last: dependency order is
discovered from table references, not declaration order — the property
that lets teams add views without curating a DAG file.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F


def definitions(spark: SparkSession, sf_dir: str):
    """Return a zero-arg callable that registers the dataflow graph
    (the shape `build_graph` and the managed runner both consume)."""
    from pyspark.pipelines import materialized_view, temporary_view

    def define() -> None:
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
                    .select("o_orderkey", "o_totalprice",
                            "o_orderpriority", "c_custkey", "c_nationkey"))

        @temporary_view(name="filtered_orders")
        def filtered_orders():
            return (spark.read.parquet(f"{sf_dir}/orders.parquet")
                    .where(F.col("o_orderstatus") == "F"))

    return define
