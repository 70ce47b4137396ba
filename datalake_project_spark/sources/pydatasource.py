"""Python DataSource (Spark 4 `pyspark.sql.datasource`) for paged JSON.

The reference's S1 source is a paginated REST payload fetched page by
page (`scripts/script_api_apify_to_spark.py:100-165`). `json_ingest`
re-expresses it as mapInPandas over a URL table; this module is the
Spark-4-idiomatic formulation: a registered **Python DataSource** whose
planner emits one ``InputPartition`` per page, so
``spark.read.format("paged_json")`` parallelizes page parsing across
executors exactly like a file scan — and composes with the rest of the
reader API (``.schema``, ``.option``, ``.load``).

Scale/plan properties:
- **partition planning**: one input partition per page file; a
  1000-page payload is a 1000-task scan, no driver-side loop.
- **filter pushdown**: ``pushFilters`` accepts EqualTo / IsNotNull on
  top-level columns and evaluates them inside the partition reader
  before rows cross into Spark — the Python-source analogue of the
  parquet ``PushedFilters`` the plan tests pin. Everything else is
  handed back to Spark unchanged (correctness never depends on the
  pushdown).
- **explicit schema**: DDL via the ``schema`` option (default
  ``json_ingest.RECORD_SCHEMA``); no sampling pass over the payload.
- **streaming**: the same source registers a ``streamReader`` — the
  offset is the pages-seen count, each micro-batch plans one partition
  per NEW page, and Spark's checkpoint carries the offset, so
  ``readStream.format("paged_json")`` ingests an append-only page feed
  exactly-once (the reference's per-DAG-run re-fetch becomes
  incremental).

Pages are local JSON files here (the sandbox has no network); the
page-discovery step is the only thing a real HTTP deployment would
swap (page URLs instead of paths), the planner/reader split is the
same.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from datalake_project_spark.sources.json_ingest import (
    RECORD_SCHEMA,
    normalize_payload,
)


_PA_TYPES = {"string": "string", "bigint": "int64", "int": "int32",
             "double": "float64", "float": "float32", "boolean": "bool_"}


def _page_batch(records: list[dict], fields: list[tuple[str, str]]):
    """One Arrow RecordBatch per page: Spark 4 accepts pyarrow batches
    from Python DataSource ``read``, which skips per-row pickling —
    the page crosses the Python/JVM boundary as ONE columnar buffer
    (the same Arrow lane pandas_udf uses) instead of N row tuples.
    Types are built from the DECLARED schema, not inferred, so an
    all-null column keeps its type."""
    import pyarrow as pa

    arrays, names = [], []
    for name, dt in fields:
        pa_type = getattr(pa, _PA_TYPES.get(dt, "string"))()
        arrays.append(pa.array([r.get(name) for r in records],
                               type=pa_type))
        names.append(name)
    return pa.RecordBatch.from_arrays(arrays, names=names)


class PagePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class PagedJsonReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.names = schema.fieldNames()
        self.fields = [(f.name, f.dataType.simpleString())
                       for f in schema.fields]
        root = options.get("path")
        if not root:
            raise ValueError("paged_json requires a 'path' option")
        self.paths = sorted(
            os.path.join(root, f) for f in os.listdir(root)
            if f.endswith(".json"))
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Keep EqualTo / IsNotNull on top-level columns; everything else
        goes back to Spark. Pushed filters are re-checked nowhere — the
        reader's output must already satisfy them (Spark trusts us)."""
        for f in filters:
            simple = (isinstance(f, (EqualTo, IsNotNull))
                      and len(f.attribute) == 1
                      and f.attribute[0] in self.names)
            if simple:
                self.pushed.append(f)
            else:
                yield f

    def partitions(self) -> list[PagePartition]:
        return [PagePartition(p) for p in self.paths]

    def _keep(self, rec: dict) -> bool:
        for f in self.pushed:
            v = rec.get(f.attribute[0])
            if isinstance(f, EqualTo):
                if v != f.value:
                    return False
            elif isinstance(f, IsNotNull):
                if v is None:
                    return False
        return True

    def read(self, partition: PagePartition):
        with open(partition.path) as fh:
            payload = json.load(fh)
        kept = [r for r in normalize_payload(payload) if self._keep(r)]
        if kept:
            yield _page_batch(kept, self.fields)


class PagedJsonStreamReader(DataSourceStreamReader):
    """Micro-batch planner over an append-only page directory: the
    offset is the count of pages ever seen (pages are named
    monotonically by the producer — the API paginator's natural order),
    so batch (start, end) maps to one ``InputPartition`` per NEW page
    and already-ingested pages are never re-read. Executors parse pages
    exactly as the batch reader does; the driver only lists the
    directory."""

    def __init__(self, schema: StructType, options: dict):
        self.names = schema.fieldNames()
        self.fields = [(f.name, f.dataType.simpleString())
                       for f in schema.fields]
        self.root = options.get("path")
        if not self.root:
            raise ValueError("paged_json requires a 'path' option")

    def _pages(self) -> list[str]:
        return sorted(
            os.path.join(self.root, f) for f in os.listdir(self.root)
            if f.endswith(".json"))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(self._pages())}

    def partitions(self, start: dict, end: dict) -> list[PagePartition]:
        return [PagePartition(p)
                for p in self._pages()[start["n"]:end["n"]]]

    def read(self, partition: PagePartition):
        with open(partition.path) as fh:
            payload = json.load(fh)
        recs = normalize_payload(payload)
        if recs:
            yield _page_batch(recs, self.fields)

    def commit(self, end: dict) -> None:
        pass  # offsets live in Spark's checkpoint; nothing source-side


class PageCommit(WriterCommitMessage):
    """One successfully written temp page per task (or None if the
    partition was empty)."""

    def __init__(self, tmp_path: str | None):
        self.tmp_path = tmp_path


class PagedJsonWriter(DataSourceWriter):
    """Writer half of the source — the raw-layer K1 sink
    (`scripts/script_api_apify_to_spark.py:125-137` dumps verbatim
    row-oriented JSON) through the Spark commit protocol: each task
    writes its rows as ONE page file under a temp name, and only the
    driver-side ``commit`` renames the temp files into the
    monotonically numbered ``page_NNNNNNNNNN.json`` sequence the batch
    and stream readers consume. A failed/speculative task leaves at
    most an orphan temp file (swept on the next commit), never a
    half-visible page — task-level exactly-once without a transaction
    log. ``overwrite`` clears the existing sequence at commit time, so
    readers never observe a partially replaced directory ordering."""

    def __init__(self, options: dict, overwrite: bool):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("paged_json requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator) -> PageCommit:
        import uuid

        records = [row.asDict() for row in iterator]
        if not records:
            return PageCommit(None)
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(records, fh)
        return PageCommit(tmp)

    def _existing_pages(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(f for f in os.listdir(self.root)
                      if f.endswith(".json"))

    def commit(self, messages) -> None:
        os.makedirs(self.root, exist_ok=True)
        if self.overwrite:
            for f in self._existing_pages():
                os.remove(os.path.join(self.root, f))
        start = len(self._existing_pages())
        done = [m.tmp_path for m in messages
                if m is not None and m.tmp_path is not None]
        for i, tmp in enumerate(done):
            os.rename(tmp, os.path.join(
                self.root, f"page_{start + i:010d}.json"))
        # sweep orphans from failed/speculative attempts
        for f in os.listdir(self.root):
            if f.startswith("_tmp_"):
                os.remove(os.path.join(self.root, f))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_path is not None and \
                    os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PagedJsonStreamWriter(DataSourceStreamWriter):
    """Streaming sink half — ``writeStream.format("paged_json")``.

    Exactly-once by micro-batch idempotence: tasks write temp files,
    and the driver-side ``commit(messages, batchId)`` concatenates
    them into ONE per-batch page published by a SINGLE ``os.rename``
    to ``page_b{batchId:010d}_0000.json``. Batch ids are monotone, so
    the name sequence stays in the lexicographic order the batch and
    stream READERS rely on. A replayed micro-batch (restart between
    sink commit and checkpoint write — the classic at-least-once
    window) is detected by its already-present ``page_b{batchId}_``
    prefix and skipped, making the sink effectively exactly-once
    without a transaction log — the same dedup-on-replay contract a
    foreachBatch MERGE gives, expressed at the sink layer.

    The one-rename publish is the atomicity guarantee: a driver crash
    mid-commit leaves either no batch page (the replay re-publishes
    everything) or the complete batch page (the replay is dropped) —
    never a partial batch. The earlier multi-rename scheme could
    crash after renaming SOME task files, and the replay would then
    see the prefix, classify the batch as committed, and discard the
    replacement temps, silently losing the unrenamed partitions."""

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("paged_json requires a 'path' option")

    def write(self, iterator) -> PageCommit:
        import uuid

        records = [row.asDict() for row in iterator]
        if not records:
            return PageCommit(None)
        os.makedirs(self.root, exist_ok=True)
        tmp = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(records, fh)
        return PageCommit(tmp)

    def commit(self, messages, batchId: int) -> None:
        import uuid

        os.makedirs(self.root, exist_ok=True)
        prefix = f"page_b{batchId:010d}_"
        done = [m.tmp_path for m in messages
                if m is not None and m.tmp_path is not None]
        already = any(f.startswith(prefix) for f in os.listdir(self.root))
        if already:
            for tmp in done:  # replayed batch: drop the duplicate payload
                if os.path.exists(tmp):
                    os.remove(tmp)
        elif done:
            # Splice task payloads into one batch page in a temp path,
            # then publish with a SINGLE atomic rename — a crash before
            # the rename leaves only temps (replay re-publishes), a crash
            # after leaves the complete batch (replay dropped). Each task
            # page is a JSON array, so the splice strips its outer
            # brackets and joins with commas: driver memory is bounded by
            # ONE task's payload, never the whole micro-batch (the
            # previous deserialize-everything concat was a driver-OOM
            # shape for large batches).
            staged = os.path.join(self.root, f"_tmp_{uuid.uuid4().hex}")
            with open(staged, "w") as out:
                out.write("[")
                first = True
                for tmp in done:
                    with open(tmp) as fh:
                        body = fh.read().strip()
                    # fail BEFORE the atomic rename on a malformed page
                    # (the pre-splice json.load concat crashed here too;
                    # blind [1:-1] would instead publish a corrupt batch)
                    if not (body.startswith("[") and body.endswith("]")):
                        raise ValueError(
                            f"task page {tmp} is not a JSON array "
                            f"(starts {body[:20]!r}); refusing to splice")
                    body = body[1:-1].strip()  # drop the task page's [ ]
                    if not body:
                        continue
                    if not first:
                        out.write(",")
                    out.write(body)
                    first = False
                out.write("]")
            os.rename(staged, os.path.join(self.root,
                                           f"{prefix}0000.json"))
            for tmp in done:
                if os.path.exists(tmp):
                    os.remove(tmp)
        for f in os.listdir(self.root):  # sweep failed-attempt orphans
            if f.startswith("_tmp_"):
                os.remove(os.path.join(self.root, f))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.tmp_path is not None and \
                    os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class PagedJsonDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paged_json"

    def schema(self) -> str:
        return self.options.get("schema", RECORD_SCHEMA)

    def reader(self, schema: StructType) -> PagedJsonReader:
        return PagedJsonReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> PagedJsonStreamReader:
        return PagedJsonStreamReader(schema, dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> PagedJsonWriter:
        return PagedJsonWriter(dict(self.options), overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> PagedJsonStreamWriter:
        return PagedJsonStreamWriter(dict(self.options))


def register_paged_json(spark) -> None:
    """Idempotent session-level registration; after this,
    ``spark.read.format("paged_json")`` resolves to this source.

    Python-source filter pushdown is gated off by default in Spark 4.1;
    a reader that implements ``pushFilters`` fails loudly unless the
    flag is on, so registration enables it (runtime-settable, harmless
    for sources that don't push)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(PagedJsonDataSource)
