"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real surface lives in ``datalake_project_spark.queries`` — one
registered QuerySpec per operator family from SURVEY.md §2 (+ §2.11
north-star extensions), each carrying its Spark implementation and,
where SQL-expressible, its DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datalake_project_spark.queries import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the labeled snapshot diff
    (the reference's core computation, SURVEY.md §2.4 J1+J2 / §7 Phase 1).
    """
    registry = load_all()
    return registry["q_snapshot_diff"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted => rows-only)."""
    return {name: spec.oracle for name, spec in load_all().items()
            if spec.oracle is not None}
