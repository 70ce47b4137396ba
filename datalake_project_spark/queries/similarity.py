"""Similarity-search queries over `embeddings`.

The brute-force top-k has a full DuckDB oracle (cosine recomputed with
identical double arithmetic: float elements widened to double, index-
order summation). The LSH variant is approximate (recall < 1 by design)
-> rows-only check; its quality is asserted in unit tests against the
brute-force baseline instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from datalake_project_spark.catalog import Catalog
from datalake_project_spark.operators.similarity import (
    cosine_topk, cosine_topk_ivf, cosine_topk_lsh,
)
from datalake_project_spark.queries import register


@register(
    "q_ann_cosine_topk",
    oracle="""
    SELECT query_id, neighbor_id, rank, ROUND(cos_sim, 6) AS cos_sim
    FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                            c.vec_id ASC) AS rank
        FROM (SELECT * FROM embeddings WHERE vec_id < 10) q
        JOIN embeddings c ON c.vec_id <> q.vec_id) t
    WHERE rank <= 5
    """,
    doc="Exact brute-force cosine top-5 for 10 query vectors: broadcast "
        "queries x candidate scan, deterministic (sim DESC, id ASC) "
        "ranking. Correctness baseline for the ANN path.",
)
def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings")
    q = e.where(F.col("vec_id") < 10)
    return cosine_topk(q, e, k=5)


@register(
    "q_ann_lsh_topk",
    oracle=None,  # approximate by design; recall asserted in unit tests
    doc="LSH-bucketed approximate top-5 (16 random hyperplanes, 4 bands): "
        "candidates from sub-band collisions, exact rescoring. The 100 TB "
        "path — cost scales with bucket collisions, not n x q.",
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings")
    q = e.where(F.col("vec_id") < 10)
    return cosine_topk_lsh(q, e, k=5)


@register(
    "q_ann_ivf_topk",
    oracle=None,  # approximate by design; recall asserted in unit tests
    doc="IVF approximate top-5: KMeans coarse quantizer (16 cells), each "
        "query probes its 4 nearest cells, exact rescoring inside. The "
        "alternative 100 TB path to LSH — candidate tables can be stored "
        "partitioned by cell, so a probe is a partition-pruned scan of "
        "n_probe/n_clusters of the data.",
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("embeddings")
    q = e.where(F.col("vec_id") < 10)
    return cosine_topk_ivf(q, e, k=5)
