"""Python DataSource (paged_json): partition planning, value parity with
the plain JSON scan, and filter pushdown semantics."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from datalake_project_spark.sources.json_ingest import read_json_files
from datalake_project_spark.sources.pydatasource import (
    PagedJsonReader,
    register_paged_json,
)

PAGES = [
    [{"username": "alice", "full_name": "Alice A"},
     {"username": "bob", "full_name": None}],
    {"items": [{"username": "carol", "full_name": "Carol C",
                "extra": "dropped"}]},
    {"username": "dave", "full_name": "Dave D"},  # bare-dict page
]


@pytest.fixture()
def page_dir(tmp_path):
    for i, page in enumerate(PAGES):
        (tmp_path / f"page_{i:03d}.json").write_text(json.dumps(page))
    return str(tmp_path)


def _load(spark, page_dir):
    register_paged_json(spark)
    return spark.read.format("paged_json").option("path", page_dir).load()


def test_values_and_partition_per_page(spark, page_dir):
    df = _load(spark, page_dir)
    assert df.rdd.getNumPartitions() == len(PAGES)
    got = {(r.username, r.full_name) for r in df.collect()}
    assert got == {("alice", "Alice A"), ("bob", None),
                   ("carol", "Carol C"), ("dave", "Dave D")}


def test_parity_with_json_scan(spark, page_dir, tmp_path):
    """Same records the executor-parallel JSON scan path produces from an
    already-normalized dump (S1 via DataSource == S2 via file scan)."""
    flat = [r for p in PAGES
            for r in (p if isinstance(p, list) else p.get("items", [p]))]
    scan_dir = tmp_path / "scan"  # outside the page dir: not a page
    scan_dir.mkdir()
    dump = scan_dir / "flat.json"
    dump.write_text(json.dumps(flat))
    via_scan = (read_json_files(spark, str(dump))
                .select("username", "full_name"))
    via_ds = _load(spark, page_dir)
    assert (sorted(map(tuple, via_ds.collect()))
            == sorted(map(tuple, via_scan.collect())))


def test_filter_pushdown_end_to_end(spark, page_dir):
    df = _load(spark, page_dir).where(
        (F.col("username") == "alice") & F.col("full_name").isNotNull())
    rows = df.collect()
    assert [(r.username, r.full_name) for r in rows] == [("alice", "Alice A")]


def test_push_filters_split(page_dir):
    """Driver-side planning: simple filters retained, others returned."""
    from pyspark.sql.datasource import (
        EqualTo, GreaterThan, IsNotNull, StringContains,
    )
    reader = PagedJsonReader(
        StructType.fromDDL("username string, full_name string"),
        {"path": page_dir})
    filters = [
        EqualTo(("username",), "alice"),
        IsNotNull(("full_name",)),
        GreaterThan(("username",), "a"),        # unsupported -> back to Spark
        EqualTo(("nested", "field"), "x"),      # non-top-level -> back
        StringContains(("username",), "li"),    # unsupported -> back
    ]
    rejected = list(reader.pushFilters(filters))
    assert len(reader.pushed) == 2 and len(rejected) == 3


def test_missing_path_and_bad_payload(spark, tmp_path):
    with pytest.raises(Exception):
        PagedJsonReader(StructType.fromDDL("a string"), {})
    bad = tmp_path / "pages"
    bad.mkdir()
    (bad / "p.json").write_text(json.dumps("not a record shape"))
    register_paged_json(spark)
    with pytest.raises(Exception):  # loud, not logged-and-continued
        (spark.read.format("paged_json")
         .option("path", str(bad)).load().collect())


def test_stream_reads_only_new_pages(spark, page_dir, tmp_path):
    """readStream over the page directory: first availableNow pass
    ingests all pages; a page appended afterwards is the ONLY content of
    the next pass (checkpointed offset = pages-seen count)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    register_paged_json(spark)

    def run_pass():
        q = (spark.readStream.format("paged_json").option("path", page_dir)
             .load()
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        return {(r.username, r.full_name)
                for r in spark.read.parquet(out).collect()}

    first = run_pass()
    assert {u for u, _ in first} == {"alice", "bob", "carol", "dave"}

    import pathlib
    (pathlib.Path(page_dir) / "page_900.json").write_text(
        json.dumps([{"username": "erin", "full_name": "Erin E"}]))
    second = run_pass()
    assert second - first == {("erin", "Erin E")}
    assert len(second) == len(first) + 1  # no re-ingestion of old pages


def test_writer_roundtrip_overwrite_and_append(spark, tmp_path):
    """df.write.format('paged_json'): rows land as numbered page files
    through the temp-then-rename commit protocol; overwrite replaces
    the sequence, append extends it; the source's own reader round-trips
    the content."""
    import os

    out = str(tmp_path / "pages")
    register_paged_json(spark)
    df = spark.createDataFrame(
        [("alice", "Alice A"), ("bob", "Bob B")],
        "username string, full_name string").repartition(2)
    df.write.format("paged_json").mode("overwrite") \
        .option("path", out).save()

    files = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert files and all(f.startswith("page_") for f in files)
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]

    back = {(r.username, r.full_name)
            for r in spark.read.format("paged_json")
            .option("path", out).load().collect()}
    assert back == {("alice", "Alice A"), ("bob", "Bob B")}

    spark.createDataFrame([("carol", "Carol C")],
                          "username string, full_name string") \
        .write.format("paged_json").mode("append") \
        .option("path", out).save()
    back2 = {(r.username, r.full_name)
             for r in spark.read.format("paged_json")
             .option("path", out).load().collect()}
    assert back2 == back | {("carol", "Carol C")}

    # overwrite resets the sequence (numbering restarts at 0)
    spark.createDataFrame([("dave", "Dave D")],
                          "username string, full_name string") \
        .write.format("paged_json").mode("overwrite") \
        .option("path", out).save()
    files = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert files == ["page_0000000000.json"]


def test_writer_feeds_stream_reader(spark, tmp_path):
    """Pages written by the writer are picked up incrementally by the
    source's own streamReader — the full source lifecycle (write ->
    batch read -> incremental read) in one format."""
    out = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    register_paged_json(spark)

    def write(rows, mode):
        spark.createDataFrame(rows, "username string, full_name string") \
            .coalesce(1).write.format("paged_json").mode(mode) \
            .option("path", out).save()

    def drain():
        q = (spark.readStream.format("paged_json").option("path", out)
             .load()
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        return {r.username for r in spark.read.parquet(sink).collect()}

    write([("alice", "Alice A")], "overwrite")
    assert drain() == {"alice"}
    write([("bob", "Bob B")], "append")
    assert drain() == {"alice", "bob"}  # only the new page re-ingested


def test_stream_writer_end_to_end_and_replay_idempotence(spark, page_dir,
                                                         tmp_path):
    """writeStream.format('paged_json'): micro-batches land as
    batch-id-prefixed page files readable by the source's own batch
    reader (the full streaming lifecycle in one format: streamReader ->
    streamWriter). A replayed micro-batch commit (the restart-between-
    sink-commit-and-checkpoint window) is detected by its batch prefix
    and dropped — effectively exactly-once."""
    import os

    out = str(tmp_path / "stream_pages")
    ckpt = str(tmp_path / "ckpt")
    register_paged_json(spark)

    q = (spark.readStream.format("paged_json").option("path", page_dir)
         .load()
         .writeStream.format("paged_json").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(60)

    files = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert files and all(f.startswith("page_b") for f in files)
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]
    back = {(r.username, r.full_name)
            for r in spark.read.format("paged_json")
            .option("path", out).load().collect()}
    assert back == {("alice", "Alice A"), ("bob", None),
                    ("carol", "Carol C"), ("dave", "Dave D")}

    # Replay the same batch id directly against the sink: the commit
    # must detect the existing prefix and drop the duplicate payload.
    from datalake_project_spark.sources.pydatasource import (
        PageCommit, PagedJsonStreamWriter,
    )
    w = PagedJsonStreamWriter({"path": out})
    batch_ids = sorted({int(f.split("_")[1][1:]) for f in files})
    dup = os.path.join(out, "_tmp_replay")
    with open(dup, "w") as fh:
        json.dump([{"username": "evil", "full_name": "Dup"}], fh)
    w.commit([PageCommit(dup)], batch_ids[0])
    after = {(r.username, r.full_name)
             for r in spark.read.format("paged_json")
             .option("path", out).load().collect()}
    assert after == back  # no duplicate row, no orphan temp
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]

    # A NEW batch id commits normally.
    new = os.path.join(out, "_tmp_new")
    with open(new, "w") as fh:
        json.dump([{"username": "erin", "full_name": "Erin E"}], fh)
    w.commit([PageCommit(new)], max(batch_ids) + 1)
    final = {r.username
             for r in spark.read.format("paged_json")
             .option("path", out).load().collect()}
    assert final == {"alice", "bob", "carol", "dave", "erin"}


def test_stream_commit_publishes_batch_atomically(spark, tmp_path):
    """The per-batch publish is ONE rename: multiple task temps are
    concatenated into a single batch page, so a crash can never leave a
    partially-renamed batch that a replay would then discard (the
    at-least-once-turned-data-loss window of a multi-rename commit).
    A replay of the same batch id drops its temps; the batch page keeps
    every partition's records."""
    import os

    from datalake_project_spark.sources.pydatasource import (
        PageCommit, PagedJsonStreamWriter,
    )

    out = str(tmp_path / "atomic_pages")
    os.makedirs(out)
    w = PagedJsonStreamWriter({"path": out})
    temps = []
    for i in range(3):
        p = os.path.join(out, f"_tmp_task{i}")
        with open(p, "w") as fh:
            json.dump([{"username": f"u{i}", "full_name": f"N{i}"}], fh)
        temps.append(p)
    w.commit([PageCommit(t) for t in temps], 7)

    files = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    assert files == ["page_b0000000007_0000.json"]  # one page per batch
    assert not [f for f in os.listdir(out) if f.startswith("_tmp_")]
    recs = json.load(open(os.path.join(out, files[0])))
    assert {r["username"] for r in recs} == {"u0", "u1", "u2"}

    # replayed batch id: duplicate payload dropped, page unchanged
    dup = os.path.join(out, "_tmp_dup")
    with open(dup, "w") as fh:
        json.dump([{"username": "dup", "full_name": "D"}], fh)
    w.commit([PageCommit(dup)], 7)
    assert sorted(f for f in os.listdir(out)
                  if f.endswith(".json")) == files
    assert {r["username"]
            for r in json.load(open(os.path.join(out, files[0])))} \
        == {"u0", "u1", "u2"}


def test_stream_commit_rejects_corrupt_task_page(spark, tmp_path):
    """The bracket-splice commit validates each task page is a JSON
    array BEFORE the atomic rename: a corrupt page fails the whole
    commit (crash-before-publish, replay re-runs the batch) instead of
    silently splicing garbage into a published batch page — the
    failure mode the pre-splice json.load concat had, preserved."""
    import os

    import pytest

    from datalake_project_spark.sources.pydatasource import (
        PageCommit, PagedJsonStreamWriter,
    )

    out = str(tmp_path / "corrupt_pages")
    os.makedirs(out)
    w = PagedJsonStreamWriter({"path": out})
    good = os.path.join(out, "_tmp_good")
    with open(good, "w") as fh:
        json.dump([{"username": "ok", "full_name": "O"}], fh)
    bad = os.path.join(out, "_tmp_bad")
    with open(bad, "w") as fh:
        fh.write('{"username": "not-an-array"}')
    with pytest.raises(ValueError, match="not a JSON array"):
        w.commit([PageCommit(good), PageCommit(bad)], 3)
    # nothing published: the batch page does not exist
    assert not [f for f in os.listdir(out) if f.endswith(".json")]
