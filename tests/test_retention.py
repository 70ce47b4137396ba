"""Lake retention (expire_runs) edge cases beyond the registered
round-trip query: keep_last bounds, missing tables, isolation between
dates.

Parametrized over BOTH backends — the copy-on-write partition Lake and
the round-5 manifest-commit ManifestLake — so the retention contract is
one spec with two implementations."""

from __future__ import annotations

import pytest

from datalake_project_spark.lake import Lake
from datalake_project_spark.manifest_lake import ManifestLake


@pytest.fixture(params=[Lake, ManifestLake], ids=["parquet", "manifest"])
def lake_cls(request):
    return request.param


def _write_runs(spark, root, date, runs, lake_cls=Lake):
    lake = lake_cls(spark, root)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    for ts in runs:
        lake.write_usage(df, "t", date, ts)
    return lake


def test_expire_keeps_newest_n(spark, tmp_path, lake_cls):
    lake = _write_runs(spark, str(tmp_path), "2026-01-01",
                       ["T01", "T02", "T03", "T04"], lake_cls)
    expired = lake.expire_runs("t", "2026-01-01", keep_last=2)
    assert expired == ["T01", "T02"]
    assert lake.list_runs("t", "2026-01-01") == ["T03", "T04"]
    # partition-pruned read sees only surviving runs
    assert lake.read_usage("t", "2026-01-01").select("run_ts") \
        .distinct().count() == 2


def test_expire_keep_last_covers_all(spark, tmp_path, lake_cls):
    lake = _write_runs(spark, str(tmp_path), "2026-01-01", ["T01"], lake_cls)
    assert lake.expire_runs("t", "2026-01-01", keep_last=5) == []
    assert lake.list_runs("t", "2026-01-01") == ["T01"]


def test_expire_zero_keep_drops_all(spark, tmp_path, lake_cls):
    lake = _write_runs(spark, str(tmp_path), "2026-01-01", ["T01", "T02"],
                       lake_cls)
    assert lake.expire_runs("t", "2026-01-01", keep_last=0) == ["T01", "T02"]
    assert lake.list_runs("t", "2026-01-01") == []


def test_expire_missing_table_is_noop(spark, tmp_path, lake_cls):
    lake = lake_cls(spark, str(tmp_path))
    assert lake.expire_runs("nope", "2026-01-01") == []
    assert lake.list_runs("nope", "2026-01-01") == []


def test_expire_isolated_per_date(spark, tmp_path, lake_cls):
    lake = _write_runs(spark, str(tmp_path), "2026-01-01", ["T01", "T02"],
                       lake_cls)
    df = spark.createDataFrame([(9, "z")], "id long, v string")
    lake.write_usage(df, "t", "2026-01-02", "T99")
    lake.expire_runs("t", "2026-01-01", keep_last=1)
    assert lake.list_runs("t", "2026-01-02") == ["T99"]
