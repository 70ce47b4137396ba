"""Multimodal-column queries: binary payload + metadata over the
documents fixture, features via Arrow-batched ``mapInPandas``.

Oracles exploit that the fixture payload is UTF-8 text, so DuckDB can
recompute the byte-level features with string functions; the Spark side
nonetheless runs the full binary-column path (encode -> binary payload ->
mapInPandas over bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalake_project_spark.catalog import Catalog
from datalake_project_spark.functions.multimodal import (
    as_media, extract_features, frame_sample,
)
from datalake_project_spark.queries import register


@register(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           length(text) - length(replace(text, 'e', '')) AS n_e,
           length(text) - length(replace(text, ' ', '')) AS n_space
    FROM documents
    """,
    doc="Binary media column + typed metadata; byte-level scalar feature "
        "extraction as an Arrow-batched mapInPandas (the decode seam for "
        "real image/audio codecs).",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return extract_features(as_media(docs))


@register(
    "q_multimodal_frame_sample",
    oracle="""
    SELECT doc_id,
           CAST(unnest(range(0, octet_length(encode(text)) // 16, 4)) AS INT) AS frame_idx
    FROM documents
    WHERE octet_length(encode(text)) // 16 > 0
    """,
    doc="Video-style frame sampling over binary payloads: every 4th "
        "16-byte 'frame' index, as a pure Spark sequence+explode plan "
        "(per-frame decode is the stubbed seam).",
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).table("documents")
    return frame_sample(as_media(docs))
