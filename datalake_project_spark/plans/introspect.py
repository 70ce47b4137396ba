"""Inspect a DataFrame's executed (AQE-final where possible) plan."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (same text as .explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple")


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges — every one is a full materialization
    + network redistribution; the scale-critical count to minimize."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning",
                          simple_plan(df)))


def broadcast_join_count(df: DataFrame) -> int:
    """Joins executed broadcast-side (no shuffle of the big side)."""
    plan = simple_plan(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    return simple_plan(df).count("SortMergeJoin")


def final_plan(df: DataFrame, execute: bool = True) -> str:
    """The AQE-final executed plan. AQE re-plans per query stage at
    runtime, so the truthful physical plan (actual join strategies,
    coalesced shuffle reads, codegen spans) exists only after execution;
    ``execute=True`` runs the plan once to obtain it."""
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_span_count(df: DataFrame) -> int:
    """Distinct whole-stage-codegen spans (the ``*(N)`` fused JVM loops)
    in the AQE-final plan. Zero on a UDF-free relational plan means the
    hot path fell out of codegen — a performance bug."""
    return len(set(re.findall(r"\*\((\d+)\)", final_plan(df))))


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the parquet scans (evaluated against row-group
    statistics before decode — the 100 TB kill switch for I/O)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def partition_filters(df: DataFrame) -> list[str]:
    """Partition-column predicates applied at file listing time — these
    prune entire directories before any file is opened (the IVF probe /
    snapshot-resolution fast path)."""
    found = re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))
    return [f for f in found if f.strip()]


def scan_columns(df: DataFrame) -> list[str]:
    """ReadSchema of each file scan — proves column pruning reached
    storage (a 2-column projection must not read 16 columns)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


_TREE_PREFIX = re.compile(r"^[\s+:\-]*")


def _indent(line: str) -> int:
    return len(line) - len(_TREE_PREFIX.sub("", line))


def _node(line: str) -> str:
    """Operator name at the start of a plan-tree line (tree art and
    whole-stage-codegen ``*(N)`` markers stripped)."""
    s = _TREE_PREFIX.sub("", line)
    return re.sub(r"^\*\(\d+\)\s*", "", s)


def single_partition_sort_smells(plan: str) -> list[str]:
    """Global-sort/window scale-killers: every ``Exchange SinglePartition``
    whose consumer (the nearest preceding line with smaller indent) is a
    Sort or Window node — Spark is about to move the ENTIRE input through
    one task to satisfy a partition-less ordering.

    Structural, not regex-on-the-Window-node: Spark 4.1.2 prints a
    partition-less Window with only two bracket groups
    (``Window [exprs], [order]``), so matching the Window line for an
    empty partition list silently never fires (the round-4 dead-detector
    lesson). A SinglePartition exchange under a final global
    HashAggregate is NOT flagged — that exchange carries one row per
    partial-aggregate partition, not the input.
    """
    lines = plan.splitlines()
    hits: list[str] = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = _indent(ln)
        for j in range(i - 1, -1, -1):
            if _indent(lines[j]) < d and _node(lines[j]).strip():
                parent = _node(lines[j])
                # Word-boundary match: SortAggregate(key=) is the sort-based
                # FINAL global aggregate (one row per partition crosses the
                # exchange) — legitimate, not a global sort of the input.
                if re.match(r"(Sort|Window|WindowGroupLimit)\b", parent):
                    hits.append(f"global-sort:{parent.split('[')[0].strip() or 'Sort'}")
                break
    return hits


def plan_summary(df: DataFrame) -> dict:
    """One-call scale scorecard for a query plan."""
    return {
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "sort_merge_joins": sort_merge_join_count(df),
        "codegen_spans": codegen_span_count(df),
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_columns(df),
    }
