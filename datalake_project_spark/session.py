"""SparkSession factory tuned for the engine.

The reference starts a bare session per process
(`scripts/script_api_apify_to_spark.py:84-87`, `airflow/dags/apify_dag.py:114-117`,
`airflow/dags/apify_dag.py:283-287` — three separate JVMs per pipeline run).
We run ONE session with scale-oriented defaults:

- AQE on (runtime coalesce / skew-join / plan re-optimization),
- runtime Bloom-filter join for large anti-join diffs,
- Arrow for every pandas boundary (the reference crossed py4j row-at-a-time),
- dynamic partition overwrite so the usage layer's "overwrite one
  (ingest_date, run_ts) partition" semantics are safe at scale,
- shuffle partitions sized from the available cores locally; on a real
  cluster AQE coalesces the 200+ default down, and the setting should be
  ~2-3x total executor cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _scratch() -> str:
    from datalake_project_spark.scratch import scratch_root
    return scratch_root()


def get_spark(app_name: str = "datalake_project_spark", master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Create (or get) the engine SparkSession with scale-ready defaults."""
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- Adaptive execution: runtime shuffle coalescing + skew-join splits.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime Bloom-filter pushdown: at 100 TB an anti-join diff where one
        # side is selective gets a bloom pre-filter on the scan side for free.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # NB: runtimeFilter.semiJoinReduction hangs job execution on this
        # Spark build (4.1.2, local mode) — verified by bisection; leave off.
        # --- Arrow on every Python/JVM data boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- Writes: overwrite only the partitions present in the output.
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Partition values keep their written string form ("0900" must not
        # become int 900 — run_ts/ingest_date are fixed-width strings whose
        # lexicographic order IS their time order).
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        # --- Shuffle sizing: local default; cluster deployments override.
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.files.maxPartitionBytes", "134217728")  # 128 MiB
        # Broadcast threshold: dims (region/nation/supplier/part at any SF that
        # fits) broadcast instead of shuffling the fact table.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Read parquet TIMESTAMP(NANOS) (unsupported by Spark) as int64;
        # Catalog.table converts back to timestamp at microsecond precision.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Run-time litter (spark-warehouse/, Derby's derby.log) goes into
        # .scratch, not the checkout root.
        .config("spark.sql.warehouse.dir", f"{_scratch()}/spark-warehouse")
        .config("spark.driver.extraJavaOptions",
                f"-Dderby.stream.error.file={_scratch()}/derby.log "
                f"-Dderby.system.home={_scratch()}")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
