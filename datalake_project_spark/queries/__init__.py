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
    # ROUND-6 WINDOW ROTATION (the r5 judge's task #5): every r5-stamped
    # query rotates to the tail; 49 of these 50 slots are queries that
    # have NEVER carried a driver CORRECTNESS stamp in rounds 1-5 (the
    # 284-query remainder), spread across every capability family. The
    # one stamped holdover is the flagship CDC diff (entry()'s query).
    # q_dedup_prefix_filter enters the window in the round it was made
    # scale-safe (arithmetic full-index denominator), so the fix itself
    # gets a driver stamp.
    #
    # Flagship + lake lifecycle / CDC / formats
    "q_snapshot_diff", "q_snapshot_asof", "q_incremental_ingest",
    "q_replica_repair", "q_zorder_layout_roundtrip", "q_snapshot_scd3",
    "q_schema_evolution", "q_json_corrupt_records", "q_file_inventory",
    # TPC-H / relational / SQL surfaces
    "q2_min_cost_supplier", "q13_order_distribution",
    "q20_excess_suppliers", "q21_waiting_supplier",
    "q_sql_pipe_syntax", "q_sql_group_order_by_all",
    "q_window_ntile_deciles", "q_unpivot",
    # Scale equipment (bucketed co-location, skew diagnostics, bloom prune)
    "q_bucketed_join_roundtrip", "q_skew_key_diagnostics",
    "q_join_bloom_prune",
    # Events / experimentation / inference
    "q_events_funnel", "q_events_retention", "q_events_changepoint",
    "q_events_dau_mau", "q_events_sprt",
    "q_events_shapley_attribution",
    # ANN representative: the round-6 portable-LSH twin (value-checked
    # signatures + candidates + rescoring, LCG hyperplanes)
    "q_ann_lsh_portable",
    # Mergeable sketches
    "q_hll_mergeable_distinct", "q_sketch_countmin", "q_sketch_ams_f2",
    # Text analysis / tokenizers / LM
    "q_text_zipf_fit", "q_text_vocab_coverage_sharded",
    "q_text_good_turing", "q_text_bpe_encode", "q_text_unigram_viterbi",
    "q_pii_redaction",
    # Quality + privacy
    "q_quality_ensemble", "q_dp_noisy_counts",
    # Dedup (the fixed prefix-filter audit + estimator/clustering audits)
    "q_dedup_prefix_filter", "q_dedup_minhash_estimator",
    "q_dedup_bcubed", "q_dedup_lsh_s_curve",
    # Embeddings / ANN audits
    "q_embed_knn_label_accuracy", "q_embed_jl_distortion",
    # Streaming
    "q_stream_heavy_hitters", "q_stream_merge_upsert",
    # Multimodal + graph + corpus + retrieval
    "q_multimodal_dhash", "q_graph_pagerank",
    "q_corpus_temperature_mix", "q_retrieval_rocchio",
)


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
