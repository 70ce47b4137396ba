"""Payload ingestion — reference S1-S3 re-expressed.

The reference fetches an API payload with requests, normalizes the three
shapes it may take (bare list / ``{"items": [...]}`` / single dict) through
pandas, projects two columns, and crosses the py4j boundary row-at-a-time
(`scripts/script_api_apify_to_spark.py:100-165`). Here:

- ``normalize_payload`` reproduces the shape handling as a pure function;
- ``ingest_records`` builds the DataFrame with an explicit schema and
  Arrow enabled (the session factory turns it on) — one vectorized
  boundary crossing instead of pickled rows;
- ``read_json_files`` is the scale path: ``spark.read.json`` with an
  explicit schema (no sampling pass), permissive mode with a corrupt-
  record column — executors parse in parallel, the driver never holds
  the payload;
- ``fetch_many`` is the scale path for the API boundary itself: a tiny
  URL table distributed via ``mapInPandas`` so a 1000-executor cluster
  fetches thousands of accounts concurrently, instead of the reference's
  one-spark-submit-per-account fan-out (`airflow/dags/apify_dag.py:83-91`).
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

RECORD_SCHEMA = "username string, full_name string"


def normalize_payload(payload: Any) -> list[dict]:
    """Coerce the three accepted payload shapes to a list of records
    (`scripts/script_api_apify_to_spark.py:144-151`): list -> itself,
    {"items": [...]} -> the list, any other dict -> [dict]. Anything else
    is an error (the reference logged-and-continued; we fail loudly)."""
    if isinstance(payload, list):
        return payload
    if isinstance(payload, dict):
        items = payload.get("items")
        if isinstance(items, list):
            return items
        return [payload]
    raise TypeError(f"unsupported payload shape: {type(payload).__name__}")


def ingest_records(spark: SparkSession, payload: Any,
                   schema: StructType | str = RECORD_SCHEMA) -> DataFrame:
    """Driver-side payload -> DataFrame with an explicit schema. Missing
    keys become NULL, extra keys are dropped (the reference's pandas
    projection, `scripts/script_api_apify_to_spark.py:154-157`)."""
    import pandas as pd

    records = normalize_payload(payload)
    names = (StructType.fromDDL(schema) if isinstance(schema, str) else schema).fieldNames()
    # Arrow driver transfer (guide §6) + row-count-derived partitioning:
    # the plain-list createDataFrame pickles rows over
    # defaultParallelism partitions, so at fixture scale every
    # downstream pipeline stage ran 32-64 near-empty tasks, every lake
    # write landed 32 tiny files (guide §6: small files hurt twice),
    # and — measured — any task that coalesces those partitions pays a
    # ~150 ms Python-worker handshake PER PARENT PARTITION (32 x 150 ms
    # ~= 5 s of dead wall per single-task job). The pandas/Arrow path
    # ships JVM-side Arrow batches (no Python workers downstream), and
    # coalesce then sizes partitions from the row count (~500k records
    # ~ 100 MB per output file); payloads big enough to exceed one
    # partition here should be arriving via the executor-parallel
    # readers (read_json_files / fetch_many) instead.
    # column-wise construction straight from the records (r12 ADVICE: the
    # intermediate list-of-tuples was a second full driver-side copy)
    pdf = pd.DataFrame({c: [r.get(c) for r in records] for c in names},
                       columns=names, dtype=object)
    df = spark.createDataFrame(pdf, schema)
    n_parts = max(1, -(-len(records) // 500_000))
    return df.coalesce(n_parts)  # no-op when already narrower


def read_json_files(spark: SparkSession, path: str,
                    schema: StructType | str = RECORD_SCHEMA,
                    multi_line: bool = True) -> DataFrame:
    """Executor-parallel JSON scan with explicit schema + corrupt-record
    capture — the 100 TB ingestion path."""
    ddl = schema if isinstance(schema, str) else schema.simpleString()
    return (
        spark.read
        .schema(f"{ddl}, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("multiLine", multi_line)
        .json(path)
    )


def fetch_many(spark: SparkSession, urls: list[tuple[str, str]],
               fetch: Callable[[str], Any],
               schema: StructType | str = RECORD_SCHEMA) -> DataFrame:
    """Distributed fetch: (account, url) pairs are partitioned across
    executors; each partition calls ``fetch(url)`` (e.g. requests.get +
    .json()), normalizes, and emits records tagged with the account.

    ``fetch`` must be picklable and is retried nowhere — callers wrap it
    with their own retry policy.
    """
    import pandas as pd

    ddl = schema if isinstance(schema, str) else schema.simpleString()
    names = StructType.fromDDL(ddl).fieldNames()
    url_df = spark.createDataFrame(urls, "account string, url string")

    def run(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            out = []
            for account, url in zip(pdf["account"], pdf["url"]):
                for rec in normalize_payload(fetch(url)):
                    out.append({"account": account,
                                **{c: rec.get(c) for c in names}})
            yield pd.DataFrame(out, columns=["account", *names])

    return url_df.repartition(max(len(urls), 1)).mapInPandas(
        run, f"account string, {ddl}")


def dump_raw(payload: Any, path: str) -> None:
    """Verbatim raw-layer dump (reference K1,
    `scripts/script_api_apify_to_spark.py:125-137`) — raw stays exactly
    what the API returned, no Spark involvement."""
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)
