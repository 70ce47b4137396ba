"""Scheduler shim — the reference DAG's outer loop as a cron-able entry.

The reference wraps its dataflow in an Airflow DAG purely for (a) an
hourly schedule, (b) retries=2 with a 30 s delay, and (c) a logical run
timestamp (`airflow/dags/apify_dag.py:35-47`, schedule at `:42-47`).
SURVEY §2.10 argues the per-account DAG should disappear into one Spark
app — which `pipeline.py` does — so what remains of the orchestration
story is exactly this module: run a registered query (typically the
pipeline capstone) under an explicit logical timestamp with the DAG's
retry policy, idempotently.

    # crontab -e  (the reference's @hourly schedule)
    0 * * * *  python -m datalake_project_spark schedule \
        q_pipeline_end_to_end --retries 2 --retry-delay 30

Semantics matched to Airflow task instances:
- **Explicit logical time.** ``--run-ts`` defaults to the wall clock
  TRUNCATED TO THE SCHEDULE TICK (``tick_seconds``, hourly by default —
  the reference DAG is ``@hourly``), so a cron re-delivery of a missed
  tick minutes later derives the SAME logical timestamp and hits the
  same idempotency marker; it is overridable for backfills
  (`airflow dags backfill` analog).
- **Retries with delay.** A failing attempt sleeps ``retry_delay`` and
  reruns, up to ``retries`` times; the exit code is 0 only on success.
- **Idempotent re-run protection.** A success marker
  (``<scratch>/sched/<query>/<run_ts>.done``) makes re-delivery of the
  same tick a no-op — cron has at-least-once delivery on missed ticks,
  and every lake write underneath is itself an idempotent partition
  rewrite, so the marker is an optimization, not a correctness crutch.
"""

from __future__ import annotations

import os
import time
import traceback


def tick_run_ts(tick_seconds: int = 3600, now: float | None = None) -> str:
    """Logical timestamp of the schedule tick containing ``now``: wall
    clock truncated to the tick boundary. Two deliveries of the same
    tick (the on-time fire and a late cron re-delivery) both derive the
    same run_ts, so the idempotency marker actually dedups them —
    Airflow's logical_date discipline, where the run is named by its
    scheduled time, never by when the scheduler got around to it."""
    t = time.time() if now is None else now
    tick = max(1, int(tick_seconds))
    return time.strftime("%Y%m%dT%H%M%S", time.gmtime(t - (t % tick)))


def scheduled_run(query: str, sf_dir: str, run_ts: str | None = None,
                  retries: int = 2, retry_delay: float = 30.0,
                  force: bool = False, tick_seconds: int = 3600) -> int:
    """Run one registered query under the DAG retry policy.

    Returns a process exit code: 0 success (or already-done), 1 when
    all attempts failed, 2 for an unknown query name.
    """
    from datalake_project_spark.queries import load_all
    from datalake_project_spark.scratch import scratch_root
    from datalake_project_spark.session import get_spark

    registry = load_all()
    if query not in registry:
        print(f"schedule: unknown query {query!r}")
        return 2
    run_ts = run_ts or tick_run_ts(tick_seconds)
    marker_dir = f"{scratch_root()}/sched/{query}"
    marker = f"{marker_dir}/{run_ts}.done"
    if os.path.exists(marker) and not force:
        print(f"schedule: {query} @ {run_ts} already succeeded; skipping "
              f"(--force reruns)")
        return 0

    last_err = None
    for attempt in range(1 + max(0, retries)):
        if attempt:
            time.sleep(retry_delay)
        try:
            spark = get_spark(f"sched:{query}@{run_ts}")
            n = registry[query].fn(spark, sf_dir).count()
            os.makedirs(marker_dir, exist_ok=True)
            with open(marker, "w") as fh:
                fh.write(f"rows={n} attempt={attempt}\n")
            print(f"schedule: {query} @ {run_ts} ok ({n} rows, "
                  f"attempt {attempt + 1})")
            return 0
        except Exception as e:  # noqa: BLE001 - retry policy boundary
            last_err = e
            traceback.print_exc()
            print(f"schedule: {query} @ {run_ts} attempt {attempt + 1} "
                  f"failed: {e}")
    print(f"schedule: {query} @ {run_ts} FAILED after "
          f"{1 + max(0, retries)} attempts: {last_err}")
    return 1
