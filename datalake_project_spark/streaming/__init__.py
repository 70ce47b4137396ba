"""Structured Streaming surface.

The reference has NO streaming (SURVEY.md §2.9): its change capture is
batch snapshot diffing scheduled hourly by Airflow
(`airflow/dags/apify_dag.py:45` ``schedule_interval='@hourly'``) — i.e.
a hand-rolled micro-batch pipeline. This package exposes the same
semantics as true Structured Streaming micro-batches, plus the windowed /
sessionized / stateful operators a continuous events table needs:

- ``sources.events_stream``  — file-source stream over the events table;
- ``ops.windowed_agg``       — tumbling/sliding event-time windows;
- ``ops.sessionized_agg``    — ``F.session_window`` gap sessions;
- ``ops.stream_dedup``       — ``dropDuplicates`` /
  ``dropDuplicatesWithinWatermark`` (bounded state for 24/7 streams);
- ``ops.user_profile_stream``— custom stateful operator via
  ``applyInPandasWithState`` (running per-user profile, the streaming
  form of the reference's per-account snapshot state);
- ``ops.run_available_now``  — drain a stream to a batch DataFrame with
  ``trigger(availableNow=True)`` (test/backfill entry point).

Scale notes: every operator keys state by the shuffle key (window ×
group, user_id), so state distributes across executors; watermarks bound
state for append-mode deployments; ``availableNow`` gives incremental
backfill over historical files with the same code path as live streams.
"""

from datalake_project_spark.streaming.sources import events_stream  # noqa: F401
from datalake_project_spark.streaming.ops import (  # noqa: F401
    run_available_now,
    sessionized_agg,
    stream_dedup,
    user_profile_stream,
    windowed_agg,
)
from datalake_project_spark.streaming.sinks import (  # noqa: F401
    run_ts_of_batch,
    stream_to_lake,
    stream_upsert_to_lake,
)
