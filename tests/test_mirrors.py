"""LIVE JDBC mirror round-trip (reference K5/S6).

No Postgres server exists in the sandbox, but Spark ships Apache Derby
(an embedded, file-backed JDBC database) on its classpath for the Hive
metastore — so the JDBC write and read paths are exercised against a
REAL JDBC connection end-to-end, mirroring the reference's Postgres
mirror (`scripts/script_api_apify_to_spark.py:282-294`) with only the
URL/driver swapped. The Postgres-specific option assembly is covered by
the contract tests in test_pipeline.py.
"""

from __future__ import annotations

import pytest

from datalake_project_spark.sources.mirrors import (
    JdbcConfig, jdbc_append, jdbc_read)


@pytest.fixture()
def derby_cfg(tmp_path):
    return JdbcConfig(url=f"jdbc:derby:{tmp_path}/mirrordb;create=true",
                      user="app", password="app",
                      driver="org.apache.derby.jdbc.EmbeddedDriver")


def test_jdbc_roundtrip_embedded(spark, derby_cfg):
    df = spark.createDataFrame(
        [("alice", "female", 0.9), ("bob", "male", 0.8)],
        "username string, predicted_gender string, confidence double")
    jdbc_append(df, derby_cfg, "final-aggregated")  # name gets sanitized
    back = jdbc_read(spark, derby_cfg, "final-aggregated")
    assert sorted(tuple(r) for r in back.collect()) == [
        ("alice", "female", 0.9), ("bob", "male", 0.8)]


def test_jdbc_append_is_append_not_overwrite(spark, derby_cfg):
    df = spark.createDataFrame([("a", 1)], "username string, n int")
    jdbc_append(df, derby_cfg, "mirror")
    jdbc_append(df, derby_cfg, "mirror")
    assert jdbc_read(spark, derby_cfg, "mirror").count() == 2


def test_jdbc_partitioned_parallel_read(spark, derby_cfg):
    """S6 at scale: partitionColumn+bounds splits the scan into parallel
    range queries — verify the split read returns the full table."""
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    jdbc_append(df, derby_cfg, "wide")
    back = jdbc_read(spark, derby_cfg, "wide", partition_column="k",
                     num_partitions=4, lower_bound=0, upper_bound=100)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"k": "sum"}).first()[0] == 4950
