"""Local interpreter for Spark Declarative Pipelines (SDP) dataflow graphs.

Spark 4.1 ships SDP (``pyspark.pipelines``): pipelines are declared as
``@materialized_view`` / ``@table`` / ``@temporary_view`` query functions
and executed by the ``spark-pipelines`` runner. The runner, however, is
built on Spark Connect and requires ``grpcio`` — absent in this sandbox
(same class of gap as ``transformWithStateInPandas``'s protobuf
dependency). The DECLARATION layer has no Connect dependency: the
decorators register ``Output`` + ``Flow`` records into whatever
``GraphElementRegistry`` is active.

This module supplies that registry plus a small scheduler, so SDP-defined
dataflow graphs run against a classic local ``SparkSession``:

- ``LocalGraphRegistry`` captures outputs/flows through the OFFICIAL
  registration contract (``graph_element_registration_context``), so the
  pipeline definitions it runs are byte-for-byte valid input for the real
  ``spark-pipelines`` runner — nothing here forks the API.
- ``run_pipeline`` executes flows to a fixpoint: each round tries every
  unfinished flow; a flow whose upstream temp view doesn't exist yet
  fails analysis and is retried next round (SDP infers edges the same
  way — from table references discovered at analysis time, not from
  explicit dependency lists). No progress in a round = a real missing
  table / cycle, reported with the analysis errors.
- Materialized views / tables are MATERIALIZED: written to a scratch
  parquet dir (honoring ``partition_cols``), re-registered as a temp
  view over the files — downstream flows read data, not a live plan, so
  each flow's lineage stays shallow exactly like the managed runner.
  Temporary views register their (lazy) plan directly.

Scale note: the interpreter adds nothing to the plans themselves — each
flow is whatever DataFrame the query function declares, so plan quality
at 100 TB is the flows' own property; the scheduler is O(flows^2) in the
worst case, on driver-side metadata only.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from pyspark.pipelines.flow import Flow
from pyspark.pipelines.graph_element_registry import (
    GraphElementRegistry,
    graph_element_registration_context,
)
from pyspark.pipelines.output import (
    MaterializedView,
    Output,
    Sink,
    StreamingTable,
    TemporaryView,
)


class LocalGraphRegistry(GraphElementRegistry):
    """Captures SDP graph elements for local execution."""

    def __init__(self) -> None:
        self.outputs: dict[str, Output] = {}
        self.flows: list[Flow] = []

    def register_output(self, output: Output) -> None:
        if output.name in self.outputs:
            raise ValueError(f"duplicate SDP output: {output.name!r}")
        self.outputs[output.name] = output

    def register_flow(self, flow: Flow) -> None:
        if any(f.target == flow.target for f in self.flows) and \
                not isinstance(self.outputs.get(flow.target),
                               StreamingTable):
            # Multi-flow (append_flow) targets are a STREAMING-table
            # feature in SDP; for batch datasets a second flow is a
            # definition bug — fail loudly.
            raise NotImplementedError(
                f"multiple flows target batch dataset {flow.target!r}; "
                "append_flow requires a create_streaming_table target")
        self.flows.append(flow)

    def register_sql(self, sql_text: str, file_path: Path) -> None:
        raise NotImplementedError(
            "SQL-file graph elements need the spark-pipelines runner")


def build_graph(*definitions: Callable[[], None]) -> LocalGraphRegistry:
    """Run SDP definition callables under a capture registry.

    Each callable applies ``pyspark.pipelines`` decorators at call time
    (decorating module-level functions at import time also works — wrap
    the imports in a callable)."""
    registry = LocalGraphRegistry()
    with graph_element_registration_context(registry):
        for define in definitions:
            define()
    return registry


def run_pipeline(spark: SparkSession, registry: LocalGraphRegistry,
                 storage: str) -> dict[str, DataFrame]:
    """Execute a captured SDP graph to fixpoint; return target -> DataFrame.

    Dependency order is discovered, not declared: a flow that references
    a not-yet-registered temp view raises AnalysisException and is
    retried after other flows complete (the managed runner resolves the
    same references during its analysis phase). Temp views for every
    target are (re)registered on the session; callers own cleanup via
    ``spark.catalog.dropTempView``."""
    pending = list(registry.flows)
    results: dict[str, DataFrame] = {}
    os.makedirs(storage, exist_ok=True)
    # A stale temp view from a previous run would let a downstream flow
    # resolve BEFORE this run recomputes its upstream — drop them so
    # the analysis-retry ordering starts from a clean namespace.
    for flow in pending:
        spark.catalog.dropTempView(flow.target)
    # append_flow fan-in: a streaming table becomes visible only after
    # its LAST flow drains, so consumers never see a partial union.
    remaining: dict[str, int] = {}
    for flow in pending:
        remaining[flow.target] = remaining.get(flow.target, 0) + 1

    while pending:
        progressed = False
        errors: dict[str, str] = {}
        for flow in list(pending):
            out = registry.outputs.get(flow.target)
            try:
                df = flow.func()
            except AnalysisException as exc:
                errors[flow.name] = str(exc).splitlines()[0]
                continue
            if isinstance(out, TemporaryView) or out is None:
                df.createOrReplaceTempView(flow.target)
                results[flow.target] = df
            elif isinstance(out, Sink):
                (df.write.format(out.format).options(**dict(out.options))
                 .mode("overwrite").save())
                results[flow.target] = df
            elif isinstance(out, StreamingTable):
                # One availableNow drain per flow (SDP's triggered-
                # execution mode): each flow appends its micro-batches
                # to the shared table path under its OWN checkpoint, so
                # append_flow fan-in works and a re-run resumes
                # incrementally from the checkpointed offsets instead
                # of re-ingesting.
                if not df.isStreaming:
                    raise TypeError(
                        f"flow {flow.name!r} targets streaming table "
                        f"{flow.target!r} but returned a batch DataFrame")
                # Each flow drains into its OWN subdirectory: Spark's
                # parquet file sink owns a _spark_metadata commit log in
                # its output dir, and two sinks sharing one dir corrupt
                # each other's logs (fan-in rows silently vanish).
                path = os.path.join(storage, flow.target, flow.name)
                ckpt = os.path.join(storage,
                                    f"_ckpt_{flow.target}_{flow.name}")
                q = (df.writeStream.format("parquet")
                     .option("path", path)
                     .option("checkpointLocation", ckpt)
                     .trigger(availableNow=True).start())
                q.awaitTermination()
                if remaining[flow.target] == 1:  # last fan-in flow
                    dirs = [os.path.join(storage, flow.target, f.name)
                            for f in registry.flows
                            if f.target == flow.target]
                    materialized = spark.read.parquet(*dirs)
                    materialized.createOrReplaceTempView(flow.target)
                    results[flow.target] = materialized
            else:  # MaterializedView / Table — materialize to storage
                path = os.path.join(storage, flow.target)
                writer = df.write.mode("overwrite")
                if getattr(out, "partition_cols", None):
                    writer = writer.partitionBy(*out.partition_cols)
                writer.parquet(path)
                materialized = spark.read.parquet(path)
                materialized.createOrReplaceTempView(flow.target)
                results[flow.target] = materialized
            remaining[flow.target] -= 1
            pending.remove(flow)
            progressed = True
        if not progressed:
            raise RuntimeError(
                "SDP graph made no progress (missing upstream or cycle): "
                f"{errors}")
    return results
