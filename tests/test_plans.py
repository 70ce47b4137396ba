"""Pin the scale-critical physical-plan properties of headline queries.

These are the 100 TB guarantees: dimension joins broadcast (no shuffle
of the fact table per dim), filters reach the parquet scan (row-group
skipping), projections prune at storage, and shuffle counts stay at the
algorithmic minimum. A regression here is a performance bug even while
results stay correct."""

from __future__ import annotations

import pytest

from datalake_project_spark.plans import (
    broadcast_join_count, codegen_span_count, exchange_count,
    pushed_filters, scan_columns,
)
from datalake_project_spark.queries import load_all

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_q1_single_shuffle_pruned_scan(spark, registry):
    """Full-table agg: exactly one exchange (partial -> final agg), the
    date filter pushed to parquet, and only the 7 needed of 16 lineitem
    columns read."""
    df = registry["q1_pricing_summary"].fn(spark, SF)
    assert exchange_count(df) == 1
    assert any("l_shipdate" in f for f in pushed_filters(df))
    cols = scan_columns(df)[0]
    assert "l_comment" not in cols and "l_orderkey" not in cols


def test_q6_zero_shuffle(spark, registry):
    """Scan-filter-agg with no grouping: no exchange at all (AQE folds
    the single-row global agg); all three predicates pushed."""
    df = registry["q6_revenue_forecast"].fn(spark, SF)
    assert exchange_count(df) == 0
    f = " ".join(pushed_filters(df))
    assert "l_shipdate" in f and "l_discount" in f and "l_quantity" in f


def test_q5_star_join_broadcasts_all_dims(spark, registry):
    """5-way star join: every dimension side broadcast — the fact table
    is never shuffled for a join, only for the final group-by."""
    df = registry["q5_local_supplier_volume"].fn(spark, SF)
    assert broadcast_join_count(df) == 5
    assert exchange_count(df) == 1  # the group-by only


def test_snapshot_diff_anti_joins_broadcast(spark, registry):
    """The CDC diff's two anti-joins broadcast at this scale (AQE decides
    by size at runtime; at 100 TB they degrade gracefully to shuffled
    hash joins on the same plan)."""
    df = registry["q_snapshot_diff"].fn(spark, SF)
    assert broadcast_join_count(df) == 2
    assert all("o_orderdate" in f for f in pushed_filters(df))


def test_dedup_exact_prunes_and_single_shuffle(spark, registry):
    """Exact dedup = hash-aggregate on the key set: one shuffle, and only
    the key columns are read from storage."""
    df = registry["q_dedup_exact"].fn(spark, SF)
    assert exchange_count(df) == 1
    assert "l_comment" not in scan_columns(df)[0]


def test_ann_brute_force_broadcasts_queries(spark, registry):
    """Brute-force cosine top-k: the (tiny) query-vector side broadcasts;
    the corpus is scanned once, never shuffled pre-join."""
    df = registry["q_ann_cosine_topk"].fn(spark, SF)
    assert broadcast_join_count(df) == 1
    assert any("vec_id" in f for f in pushed_filters(df))


def test_q8_snowflake_single_exchange(spark, registry):
    """Six-way snowflake with NO explicit hints on the large sides: at
    this SF the planner still broadcasts all six (size-based), leaving
    one exchange for the year group-by. At 100 TB the same plan degrades
    per-join to shuffle — no code change."""
    df = registry["q8_market_share"].fn(spark, SF)
    assert broadcast_join_count(df) == 6
    assert exchange_count(df) == 1


def test_codegen_active(spark, registry):
    """Whole-stage codegen fuses the hot path (non-zero spans on a plain
    agg query — UDF-free plans must stay inside the JVM)."""
    df = registry["q1_pricing_summary"].fn(spark, SF)
    assert codegen_span_count(df) >= 1
