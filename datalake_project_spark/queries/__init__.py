"""Query registry — the engine's declared capability surface.

Every operator family from SURVEY.md §2 (plus the north-star §2.11
extensions) is exercised by at least one named query here. Each entry
carries BOTH the Spark implementation and, where SQL-expressible, an
ANSI-SQL oracle that DuckDB runs over the same Parquet — the driver's
correctness gate compares the two (row count + schema + value hash).

Column names are aliased identically on both sides; double-typed
aggregates are rounded on both sides so ulp-level float summation-order
differences between engines don't flip the hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        # A dict write would silently shadow an earlier registration (this
        # bit once: two modules both registered q5_local_supplier_volume
        # and only the later import survived) — fail loudly instead.
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn
    return deco


# Explicit registry ordering. The correctness driver checks the FIRST 50
# entries of ``queries()``, so the head of this list is curated to cover the
# full capability spread — every CDC/dedup/similarity/text/events/streaming/
# multimodal operator plus one representative of each relational family —
# rather than whatever import order happens to produce. Queries not listed
# here follow in module import order (still run locally/by the judge, just
# past the driver's verification window).
PRIORITY: tuple[str, ...] = (
    # ROUND-11 WINDOW ROTATION (the r10 judge's task #1): every
    # previously stamped query rotates to the tail; 49 of these 50
    # slots have NEVER carried a driver CORRECTNESS stamp in rounds
    # 1-10 — 44 drawn from the 77-query never-stamped remainder
    # (ALL of inference and events, 6 of relational5, plus one each
    # multimodal/graph/text/robust for family spread) and 5 NEW
    # this-round family seeds keeping the fully-stamped dedup / ann /
    # streaming / lake / retrieval families represented without
    # re-stamping an old member. The one stamped holdover is the
    # flagship CDC diff (entry()'s query).
    #
    # Flagship
    "q_snapshot_diff",
    # NEW this round: family seeds (one per fully-stamped family)
    "q_dedup_idf_weighted_jaccard", "q_ann_ivf_occupancy_audit",
    "q_stream_scd2_enrich", "q_lake_compaction_plan",
    "q_retrieval_query_likelihood",
    # Inference / statistics (entire backlog)
    "q_events_matched_att", "q_events_ucb_allocation",
    "q_classifier_brier_decomposition", "q_stats_join_cardinality_audit",
    "q_feature_imputation_audit", "q_recs_novelty",
    "q_events_rate_test_exact", "q_stats_wasserstein_years",
    "q_embed_cka_halves", "q_embed_anisotropy", "q_feature_woe_iv",
    "q_stats_runs_test", "q_stats_tost_equivalence",
    "q_stats_gumbel_maxima", "q_stats_sign_test",
    "q_stats_wilcoxon_signed_rank", "q_stats_levene",
    "q_stats_effect_size", "q_stats_g_test", "q_events_propensity_ipw",
    # Events (entire backlog; q_asof_join_nearest is the r10 operator)
    "q_asof_join_nearest", "q_events_autocorrelation",
    "q_events_power_analysis", "q_events_journey_trigrams",
    "q_events_reactivation", "q_events_anova",
    "q_events_cross_correlation", "q_events_time_weighted_avg",
    "q_sketch_quantile_histogram", "q_events_overdispersion",
    "q_events_session_gap_sweep", "q_events_burstiness_coefficient",
    "q_events_markov_entropy_rate", "q_events_context_gain",
    # Relational (relational5 backlog, 6 of 12)
    "q_sql_identifier_param", "q_orders_backlog_series",
    "q_recs_item_knn", "q_orders_seasonal_index",
    "q_customer_segment_migration", "q_orders_fulfillment_latency",
    # Family spread: multimodal / graph / text / corpus-prefix
    "q_multimodal_features_arrow", "q_graph_local_clustering",
    "q_text_distinct_n", "q_corpus_tokenizer_fertility",
)


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Small driver-side row list -> DataFrame in ONE partition.

    Plain ``createDataFrame(list)`` slices the rows over
    defaultParallelism pickled partitions, so the first action runs 32+
    Python-worker tasks for a handful of rows — measured ~2 s warm on
    local[32] for a 20-row frame vs ~0.7 s through this helper (r12).
    Same pickle serialization and schema verification as the direct
    call, so values and types are bit-identical; only the slicing
    changes. For big data use the executor-parallel readers, never
    driver-side lists."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def load_all() -> dict[str, QuerySpec]:
    """Import every query module; return the registry in PRIORITY order."""
    from datalake_project_spark.queries import (  # noqa: F401
        relational, relational2, relational3, relational4, cdc, events,
        relational5, text, quality, dedup, similarity, streaming,
        multimodal, formats, corpus, substrings, audit, graph,
        retrieval, ml, robust, inference,
    )
    ordered: dict[str, QuerySpec] = {}
    for name in PRIORITY:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, spec in REGISTRY.items():
        ordered.setdefault(name, spec)
    return ordered
