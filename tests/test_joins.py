"""As-of join and range join semantics on handwritten event fixtures."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from datalake_project_spark.operators.joins import asof_join, range_join
from tests.conftest import rows


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame([
        (1, 10, _ts("2024-01-01 10:00:00")),
        (2, 10, _ts("2024-01-01 12:00:00")),
        (3, 20, _ts("2024-01-01 09:00:00")),   # before any right row
        (4, 30, _ts("2024-01-01 10:30:00")),   # equal-ts match (inclusive)
    ], "id long, k long, ts timestamp")
    right = spark.createDataFrame([
        (100, 10, _ts("2024-01-01 09:30:00")),
        (101, 10, _ts("2024-01-01 11:00:00")),
        (102, 20, _ts("2024-01-01 09:30:00")),
        (103, 30, _ts("2024-01-01 10:30:00")),
    ], "rid long, k long, ts timestamp")
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_cols=["rid"], suffix="_r")
    m = {r["id"]: r["rid_r"] for r in got.collect()}
    assert m == {1: 100, 2: 101, 3: None, 4: 103}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = asof_join(left, right, on=["k"], left_ts="ts", right_ts="ts",
                    right_cols=["rid"], suffix="_r",
                    tolerance_seconds=1800)
    m = {r["id"]: r["rid_r"] for r in got.collect()}
    # id=1: 10:00 vs 09:30 => 1800s, within (<=); id=2: 12:00 vs 11:00 => out.
    assert m == {1: 100, 2: None, 3: None, 4: 103}


def test_range_join_window(spark):
    left, right = _frames(spark)
    l, r = left.alias("l"), right.alias("r")
    got = range_join(
        l, r,
        condition=(F.col("l.k") == F.col("r.k"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") < F.col("l.ts") + F.expr("INTERVAL 2 HOURS")),
    ).select(F.col("l.id"), F.col("r.rid"))
    assert rows(got) == [(1, 101), (3, 102), (4, 103)]


def test_asof_join_nearest_directions_ties_tolerance(spark):
    """Nearest as-of: forward-only match works, backward wins exact
    distance ties, and tolerance (100s) nulls far matches — the pandas
    merge_asof(direction='nearest') contract."""
    from datalake_project_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(1, "a", 100.0), (2, "a", 205.0), (3, "b", 50.0), (4, "c", 10.0)],
        "id long, k string, t double").select(
        "id", "k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        # k=a: 110 (fwd of 100 by 10; back of 205 by 95) and 300 (fwd
        # of 205 by 95 -> exact tie, backward 110 must win)
        # k=b: only a forward row at 60 (backward-only join would miss)
        # k=c: nearest is 500s away -> outside 100s tolerance
        [("a", 110.0), ("a", 300.0), ("b", 60.0), ("c", 510.0)],
        "k string, t double").select(
        "k", F.timestamp_seconds("t").alias("ts"))

    out = {r["id"]: r for r in asof_join_nearest(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols=["ts"], suffix="_r",
        tolerance_seconds=100).collect()}
    get = lambda i: (out[i]["ts_r"].timestamp()
                     if out[i]["ts_r"] is not None else None)
    assert get(1) == 110.0          # forward match (10s) beats back (none)
    assert get(2) == 110.0          # 95s tie both ways -> backward wins
    assert get(3) == 60.0           # forward-only group still matches
    assert get(4) is None           # 500s > 100s tolerance -> null


def test_asof_null_timestamps_defined_semantics(spark):
    """NULL-ts guard (r10 advice): a NULL-ts right row must never match
    (it used to sort first and become an arbitrary backward/forward
    match) and a NULL-ts left row is kept with a NULL match — for BOTH
    the backward and the nearest variant."""
    from datalake_project_spark.operators.joins import (
        asof_join, asof_join_nearest)

    left = spark.createDataFrame(
        [(1, "a", 100.0), (2, "a", None)],
        "id long, k string, t double").select(
        "id", "k", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [("a", None, "bogus"), ("a", 90.0, "real")],
        "k string, t double, tag string").select(
        "k", F.timestamp_seconds("t").alias("ts"), "tag")

    for fn in (asof_join, asof_join_nearest):
        out = {r["id"]: r for r in fn(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_cols=["ts", "tag"], suffix="_r").collect()}
        assert len(out) == 2, fn.__name__      # null-ts left row kept
        assert out[1]["tag_r"] == "real", fn.__name__
        assert out[2]["tag_r"] is None, fn.__name__
