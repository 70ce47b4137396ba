"""Snapshot-diff operator semantics (SURVEY §2.4 J1-J3, §2.7 windowed form).

E2E property from FIXTURES.md §A: t1 = t0 - D + A (A, D disjoint) =>
diff(t1, t0) = A tagged 'added' UNION D tagged 'deleted', exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_project_spark.operators.diff import snapshot_diff, snapshot_diff_windowed
from tests.conftest import rows


def _snap(spark, users):
    return spark.createDataFrame([(u, f"Full {u}") for u in users],
                                 "username string, full_name string")


def test_diff_added_deleted_exact(spark):
    t0 = _snap(spark, ["a", "b", "c", "d"])
    t1 = _snap(spark, ["b", "c", "e", "f"])  # -a -d +e +f
    got = rows(snapshot_diff(t1, t0, keys=["username", "full_name"]))
    assert got == sorted([
        ("e", "Full e", "added"), ("f", "Full f", "added"),
        ("a", "Full a", "deleted"), ("d", "Full d", "deleted"),
    ])


def test_diff_identical_snapshots_empty(spark):
    t0 = _snap(spark, ["a", "b"])
    assert snapshot_diff(t0, t0, keys=["username", "full_name"]).count() == 0


def test_diff_custom_labels(spark):
    t0 = _snap(spark, ["a"])
    t1 = _snap(spark, ["b"])
    got = rows(snapshot_diff(t1, t0, keys=["username"],
                             added_label="added_global",
                             deleted_label="deleted_global"))
    labels = {r[-1] for r in got}
    assert labels == {"added_global", "deleted_global"}


def test_diff_roundtrip_property(spark):
    """prev + added - deleted == cur (set semantics on the key)."""
    t0 = _snap(spark, [f"u{i}" for i in range(50)])
    t1 = _snap(spark, [f"u{i}" for i in range(20, 70)])
    d = snapshot_diff(t1, t0, keys=["username", "full_name"])
    added = d.where(F.col("change") == "added").drop("change")
    deleted = d.where(F.col("change") == "deleted").drop("change")
    recon = t0.unionByName(added).exceptAll(deleted)
    assert rows(recon) == rows(t1)


def test_windowed_diff_equals_pairwise(spark):
    """The one-shuffle windowed N-snapshot diff must agree with N-1
    pairwise anti-join diffs, including re-appearance gaps."""
    series = [
        (1, ["a", "b", "c"]),
        (2, ["b", "c", "d"]),      # -a +d
        (3, ["a", "c"]),           # +a -b -d  (a re-appears)
        (4, ["c"]),                # -a
    ]
    snaps = spark.createDataFrame(
        [(ts, u) for ts, us in series for u in us], "ts int, username string")

    got = rows(snapshot_diff_windowed(snaps, keys=["username"], ts_col="ts")
               .select("username", "snapshot_ts", "change"))

    expected = []
    for (ts0, u0), (ts1, u1) in zip(series, series[1:]):
        expected += [(u, ts1, "added") for u in set(u1) - set(u0)]
        expected += [(u, ts1, "deleted") for u in set(u0) - set(u1)]
    assert got == sorted(expected)


def test_windowed_diff_single_snapshot_empty(spark):
    snaps = spark.createDataFrame([(1, "a")], "ts int, username string")
    assert snapshot_diff_windowed(snaps, keys=["username"], ts_col="ts").count() == 0


def test_upsert_all_tombstones_clears_partition(spark, tmp_path):
    """Regression (hypothesis-found): a MERGE whose tombstones delete
    EVERY surviving row must leave an empty partition — the dynamic
    overwrite path writes zero rows and names no partitions, which
    used to resurrect the old data."""
    from pyspark.sql import functions as F

    from datalake_project_spark.lake import Lake

    lake = Lake(spark, str(tmp_path / "lake"))
    lake.write_usage(spark.createDataFrame([(0, "a"), (1, "b")],
                                           "k long, v string"),
                     "t", "20260814", "r1")
    tomb = spark.createDataFrame([(0, None, True), (1, None, True)],
                                 "k long, v string, del boolean")
    lake.upsert(tomb, "t", "20260814", "r1", keys=["k"],
                delete_col="del")
    assert lake.read_usage("t", "20260814", "r1").count() == 0
    # and a later partial re-insert works on the cleared partition
    lake.upsert(spark.createDataFrame([(2, "c", False)],
                                      "k long, v string, del boolean"),
                "t", "20260814", "r1", keys=["k"], delete_col="del")
    got = {(r["k"], r["v"]) for r in
           lake.read_usage("t", "20260814", "r1")
           .select("k", "v").collect()}
    assert got == {(2, "c")}
