"""End-to-end streaming CDC: snapshot files arrive as micro-batches,
land as run_ts partitions of the usage layer via foreachBatch, and the
batch diff/latest-snapshot operators work unchanged on what the stream
wrote. Also pins the exactly-once property (re-landing a batch does not
duplicate rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_project_spark.lake import Lake
from datalake_project_spark.operators.diff import snapshot_diff
from datalake_project_spark.streaming import run_ts_of_batch, stream_to_lake

SCHEMA = "username string, full_name string"
SNAP1 = [("ana", "Ana A"), ("bo", "Bo B"), ("cy", "Cy C")]
SNAP2 = [("bo", "Bo B"), ("cy", "Cy C"), ("di", "Di D")]  # -ana +di


@pytest.fixture()
def snap_dir(spark, tmp_path):
    """Two snapshot files written one-per-file so maxFilesPerTrigger=1
    yields two ordered micro-batches."""
    d = tmp_path / "incoming"
    for i, data in enumerate((SNAP1, SNAP2)):
        df = spark.createDataFrame(data, SCHEMA)
        # one file per snapshot, named so batch order == snapshot order
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"stage{i}"))
    d.mkdir()
    import glob
    import os
    import shutil
    import time
    now = time.time()
    for i in range(2):
        src = glob.glob(str(tmp_path / f"stage{i}" / "part-*.parquet"))[0]
        dst = d / f"snap{i}.parquet"
        shutil.copy(src, dst)
        # FileStreamSource orders batches by modification time, not name
        os.utime(dst, (now - 3600 + i * 60, now - 3600 + i * 60))
    return str(d)


def test_stream_lands_partitions_and_diff_works(spark, tmp_path, snap_dir):
    lake = Lake(spark, str(tmp_path / "lake"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(snap_dir))
    q = stream_to_lake(stream, lake, "followers", "20260813",
                       checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()

    # two micro-batches -> two run_ts partitions
    parts = [r["run_ts"] for r in
             lake.read_usage("followers", "20260813")
             .select("run_ts").distinct().collect()]
    assert sorted(parts) == [run_ts_of_batch(0), run_ts_of_batch(1)]

    # batch operators over stream-written partitions
    prev_ts = lake.latest_run_before("followers", "20260813", run_ts_of_batch(1))
    assert prev_ts == run_ts_of_batch(0)
    cur = lake.read_usage("followers", "20260813", run_ts_of_batch(1)) \
        .select("username", "full_name")
    prev = lake.read_usage("followers", "20260813", prev_ts) \
        .select("username", "full_name")
    diff = {(r["username"], r["change"])
            for r in snapshot_diff(cur, prev, keys=["username", "full_name"]).collect()}
    assert diff == {("di", "added"), ("ana", "deleted")}


def test_replayed_batch_is_idempotent(spark, tmp_path, snap_dir):
    """Re-running the stream with a FRESH checkpoint re-lands the same
    batch ids; dynamic partition overwrite makes that a no-op instead of
    an append-duplication."""
    lake = Lake(spark, str(tmp_path / "lake"))
    for attempt in range(2):  # second run replays batches 0 and 1
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(snap_dir))
        q = stream_to_lake(stream, lake, "followers", "20260813",
                           checkpoint_dir=str(tmp_path / f"ckpt{attempt}"))
        q.awaitTermination()
    total = lake.read_usage("followers", "20260813").count()
    assert total == len(SNAP1) + len(SNAP2)  # no duplication


def test_compact_reduces_file_count(spark, tmp_path):
    """Many small files (a streaming sink's natural output) compact to one
    per partition, with row-for-row identical content."""
    from pyspark.sql import functions as F

    lake = Lake(spark, str(tmp_path / "lake"))
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("grp")).repartition(16)
    lake.write_usage(df, "t", "20260813", "0100")

    before = lake.compact("t", "20260813", "0100", target_files=1)
    assert before == 16
    after_df = lake.read_usage("t", "20260813", "0100")
    assert (after_df.select(F.input_file_name()).distinct().count() == 1)
    assert after_df.count() == 1000
    assert after_df.agg(F.sum("id")).first()[0] == 499500
    # idempotent: second run is a no-op
    assert lake.compact("t", "20260813", "0100", target_files=1) == 1


def test_upsert_merge_semantics(spark, tmp_path):
    """Matched keys are replaced, unmatched inserted, untouched rows kept."""
    lake = Lake(spark, str(tmp_path / "lake"))
    base = spark.createDataFrame(
        [("ana", "Ana A"), ("bo", "Bo B"), ("cy", "Cy C")], SCHEMA)
    lake.write_usage(base, "followers", "20260813", "0900")

    updates = spark.createDataFrame(
        [("bo", "Bo B2"), ("di", "Di D")], SCHEMA)  # update bo, insert di
    lake.upsert(updates, "followers", "20260813", "0900", keys=["username"])

    got = {(r["username"], r["full_name"])
           for r in lake.read_usage("followers", "20260813", "0900").collect()}
    assert got == {("ana", "Ana A"), ("bo", "Bo B2"),
                   ("cy", "Cy C"), ("di", "Di D")}

    # idempotent: applying the same updates again changes nothing
    lake.upsert(updates, "followers", "20260813", "0900", keys=["username"])
    again = {(r["username"], r["full_name"])
             for r in lake.read_usage("followers", "20260813", "0900").collect()}
    assert again == got


def test_upsert_creates_table_when_absent(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    updates = spark.createDataFrame([("zz", "Zz Z")], SCHEMA)
    lake.upsert(updates, "fresh", "20260813", "0900", keys=["username"])
    assert lake.read_usage("fresh", "20260813", "0900").count() == 1

def test_upsert_delete_tombstones(spark, tmp_path):
    """delete_col rows remove matching target keys and are not inserted;
    NULL in the tombstone column means not-a-delete."""
    from pyspark.sql.types import (BooleanType, StringType, StructField,
                                   StructType)

    lake = Lake(spark, str(tmp_path / "lake"))
    base = spark.createDataFrame(
        [("ana", "Ana A"), ("bo", "Bo B"), ("cy", "Cy C")], SCHEMA)
    lake.write_usage(base, "followers", "20260813", "0900")

    upd_schema = StructType([
        StructField("username", StringType()),
        StructField("full_name", StringType()),
        StructField("is_deleted", BooleanType()),
    ])
    updates = spark.createDataFrame(
        [("bo", "Bo B2", False),   # matched -> update
         ("cy", None, True),       # matched -> delete
         ("di", "Di D", None),     # NULL tombstone -> insert
         ("zz", None, True)],      # unmatched tombstone -> no-op
        upd_schema)
    lake.upsert(updates, "followers", "20260813", "0900",
                keys=["username"], delete_col="is_deleted")

    got = {(r["username"], r["full_name"])
           for r in lake.read_usage("followers", "20260813", "0900").collect()}
    assert got == {("ana", "Ana A"), ("bo", "Bo B2"), ("di", "Di D")}

    # idempotent: the same MERGE applied again changes nothing
    lake.upsert(updates, "followers", "20260813", "0900",
                keys=["username"], delete_col="is_deleted")
    again = {(r["username"], r["full_name"])
             for r in lake.read_usage("followers", "20260813", "0900").collect()}
    assert again == got

def test_stream_upsert_last_writer_wins(spark, tmp_path, snap_dir):
    """CDC MERGE sink: two ordered micro-batches upsert into ONE state
    partition; keys in both batches carry the later batch's values,
    keys absent from later batches survive untouched."""
    from datalake_project_spark.streaming import stream_upsert_to_lake

    lake = Lake(spark, str(tmp_path / "lake"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(snap_dir))
    q = stream_upsert_to_lake(stream, lake, "state", "20260813", "cur",
                              keys=["username"],
                              checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = {(r["username"], r["full_name"])
           for r in lake.read_usage("state", "20260813", "cur").collect()}
    # SNAP1 ∪ SNAP2 keyed by username, SNAP2 winning on overlap
    assert got == {("ana", "Ana A"), ("bo", "Bo B"),
                   ("cy", "Cy C"), ("di", "Di D")}

def test_write_audit_publish_refusal(spark, tmp_path):
    """A failing audit retains staging and never touches published; a
    clean audit promotes the staged partition byte-for-byte."""
    from pyspark.sql import functions as F

    lake = Lake(spark, str(tmp_path / "lake"))
    dirty = spark.createDataFrame(
        [("ana", "Ana A"), ("ana", "Ana A2"), (None, "Ghost")], SCHEMA)

    def audit(staged):
        row = staged.agg(
            (F.count(F.lit(1)) - F.count("username")).alias("nulls"),
            (F.count(F.lit(1)) - F.countDistinct("username")).alias("dups"),
        ).first()
        return row["nulls"] + row["dups"]

    v = lake.write_audit_publish(dirty, "followers", "20260813",
                                 "published", audit)
    assert v == 3  # 1 null + 2 non-distinct rows (dup pair + null row)
    runs = lake.list_runs("followers", "20260813")
    assert runs == ["staging"]  # staged retained, nothing published

    clean = spark.createDataFrame([("ana", "Ana A"), ("bo", "Bo B")], SCHEMA)
    v = lake.write_audit_publish(clean, "followers", "20260813",
                                 "published", audit)
    assert v == 0
    got = {(r["username"], r["full_name"]) for r in
           lake.read_usage("followers", "20260813", "published").collect()}
    assert got == {("ana", "Ana A"), ("bo", "Bo B")}


def test_restart_resumes_from_checkpoint_no_duplicates(spark, tmp_path,
                                                       snap_dir):
    """Restart-RESUME (the property test_replayed_batch_is_idempotent
    does NOT cover — that one uses fresh checkpoints): stop the stream
    after the first two snapshots, land a THIRD file, restart with the
    SAME checkpoint dir. The resumed stream must process only the new
    file (offsets advance from the checkpoint) and the lake must hold
    exactly three partitions with no re-landed rows — the exactly-once
    restart contract every production stream relies on."""
    import shutil
    import time

    lake = Lake(spark, str(tmp_path / "lake"))
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(snap_dir))
        q = stream_to_lake(stream, lake, "followers", "20260813",
                          checkpoint_dir=ckpt)
        q.awaitTermination()

    run_once()
    n_after_first = lake.read_usage("followers", "20260813").count()
    assert n_after_first == len(SNAP1) + len(SNAP2)

    # a third snapshot arrives while the stream is down
    snap3 = [("di", "Di D"), ("ed", "Ed E")]
    df = spark.createDataFrame(snap3, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage2"))
    import glob
    src = glob.glob(str(tmp_path / "stage2" / "part-*.parquet"))[0]
    shutil.copy(src, f"{snap_dir}/snap2.parquet")
    now = time.time()
    import os
    os.utime(f"{snap_dir}/snap2.parquet", (now, now))

    run_once()  # same checkpoint: resumes at batch 2, reads ONLY snap2
    parts = sorted(r["run_ts"] for r in
                   lake.read_usage("followers", "20260813")
                   .select("run_ts").distinct().collect())
    assert parts == [run_ts_of_batch(0), run_ts_of_batch(1),
                     run_ts_of_batch(2)]
    # no duplicates in the resumed partition, old partitions untouched
    assert lake.read_usage("followers", "20260813").count() \
        == n_after_first + len(snap3)
    got3 = {(r["username"], r["full_name"]) for r in
            lake.read_usage("followers", "20260813", run_ts_of_batch(2))
            .select("username", "full_name").collect()}
    assert got3 == set(snap3)
