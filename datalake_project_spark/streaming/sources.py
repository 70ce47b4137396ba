"""Streaming sources.

File-based Structured Streaming source over the ``events`` table. A
FileStreamSource monitors a DIRECTORY and picks up files as they land —
exactly the shape of the reference's raw layer, where each hourly run
drops a new file under the table directory
(`scripts/script_api_apify_to_spark.py:125-137`). For the single-file
fixture tables we stage a symlink into a temp directory; in production
the table path IS the monitored directory and new snapshot files become
new micro-batches.

The events fixture stores ``ts`` as parquet TIMESTAMP(NANOS); with
``spark.sql.legacy.parquet.nanosAsLong`` (session factory) it surfaces
as int64 nanoseconds, converted here to a microsecond timestamp — same
contract as the batch Catalog (`datalake_project_spark/catalog.py`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

# Explicit schema: streaming file sources require one (no inference pass),
# which is also the right call at scale — schema-on-write (SURVEY §4.1).
EVENTS_RAW_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as int64 nanos
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def stage_dir(*files: str) -> str:
    """Symlink files into a fresh temp directory (a FileStreamSource needs
    a directory to monitor; fixture tables are single files)."""
    d = tempfile.mkdtemp(prefix="dlps_stream_")
    for f in files:
        os.symlink(os.path.abspath(f), os.path.join(d, os.path.basename(f)))
    return d


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming scan of the events table with the engine's contract
    schema (``ts`` as timestamp). ``max_files_per_trigger`` throttles
    micro-batch size for live deployments."""
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    monitored = stage_dir(path) if os.path.isfile(path) else path
    return (
        reader.parquet(monitored)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
