"""Data-quality / safety queries for the LLM training-data pipeline
(SURVEY.md §2.11): PII redaction and Gopher-style repetition filtering.

Both are pure Column-expression / explode+groupBy plans — no Python
workers — and both carry full DuckDB oracles running the identical
regexes and arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from datalake_project_spark.catalog import Catalog
from datalake_project_spark.functions.text import (
    PII_EMAIL, PII_IPV4, PII_PHONE, pii_count, redact_pii, tokens,
)
from datalake_project_spark.queries import register

# Deterministic synthetic PII derived from doc_id, appended to each
# document IN THE QUERY on both engines: the fixture corpus contains no
# natural PII, so the redaction operator is exercised against content
# that provably contains one email, one phone, and one IPv4 per doc.
_AUG_SQL = """
    SELECT doc_id,
           text || ' contact user' || doc_id || '@mail.example.org or +1-555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '-'
                || lpad(CAST(doc_id % 997 AS VARCHAR), 3, '0')
                || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS t
    FROM documents
"""


def _augmented(d: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), did.cast("string"),
            F.lit("@mail.example.org or +1-555-"),
            F.lpad((did % 10000).cast("string"), 4, "0"), F.lit("-"),
            F.lpad((did % 997).cast("string"), 3, "0"),
            F.lit(" from 10."), (did % 256).cast("string"),
            F.lit(".0."), ((did * 7) % 256).cast("string"),
        ).alias("t"),
    )


@register(
    "q_pii_redaction",
    oracle=f"""
    WITH aug AS ({_AUG_SQL})
    SELECT doc_id,
           len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(t, '{PII_PHONE}')) AS n_phones,
           len(regexp_extract_all(t, '{PII_IPV4}')) AS n_ips,
           regexp_replace(
               regexp_replace(
                   regexp_replace(t, '{PII_EMAIL}', '[EMAIL]', 'g'),
                   '{PII_PHONE}', '[PHONE]', 'g'),
               '{PII_IPV4}', '[IP]', 'g') AS redacted
    FROM aug
    """,
    doc="PII detection + redaction (emails, phones, IPv4) over documents "
        "augmented with deterministic doc_id-derived PII. Single "
        "narrow-dependency projection: at 100 TB this is a zero-shuffle "
        "map over the scan, whole-stage-codegen regexes. The oracle runs "
        "the identical RE2/Java-compatible patterns.",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    aug = _augmented(d)
    return aug.select(
        "doc_id",
        pii_count("t", PII_EMAIL).alias("n_emails"),
        pii_count("t", PII_PHONE).alias("n_phones"),
        pii_count("t", PII_IPV4).alias("n_ips"),
        redact_pii("t").alias("redacted"),
    )


@register(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                           w -> w <> '') AS ws
        FROM documents),
    wc AS (SELECT doc_id, w, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(ws) AS w FROM toks) GROUP BY 1, 2),
    wstats AS (SELECT doc_id, MAX(c) AS top_c, CAST(SUM(c) AS BIGINT) AS n,
                      COUNT(*) AS n_uniq
               FROM wc GROUP BY 1),
    bg AS (SELECT doc_id,
                  [ws[i] || ' ' || ws[i + 1] FOR i IN range(1, len(ws))] AS bs
           FROM toks WHERE len(ws) >= 2),
    bc AS (SELECT doc_id, b, COUNT(*) AS c
           FROM (SELECT doc_id, unnest(bs) AS b FROM bg) GROUP BY 1, 2),
    bstats AS (SELECT doc_id, MAX(c) AS top_bc, CAST(SUM(c) AS BIGINT) AS bn
               FROM bc GROUP BY 1)
    SELECT w.doc_id,
           ROUND(top_c::DOUBLE / n, 4) AS top_word_frac,
           ROUND(COALESCE(top_bc::DOUBLE / bn, 0), 4) AS top_bigram_frac,
           ROUND(n_uniq::DOUBLE / n, 4) AS unique_word_frac,
           (top_c::DOUBLE / n > 0.15 OR COALESCE(top_bc::DOUBLE / bn, 0) > 0.08
            OR n_uniq::DOUBLE / n < 0.4) AS repetitive
    FROM wstats w LEFT JOIN bstats b USING (doc_id)
    """,
    doc="Gopher-style repetition quality filter: per-document fraction of "
        "words in the most frequent word / most frequent bigram, and "
        "unique-word fraction, flagged repetitive past fixed thresholds. "
        "Shaped as explode -> two keyed groupBys (map-side partial "
        "aggregation both times, shuffle keys are (doc_id, gram)) rather "
        "than per-row array histograms, so Catalyst never sees a wide "
        "expression tree and the shuffle stays proportional to token "
        "count at 100 TB.",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    toks = d.select("doc_id", tokens("text").alias("ws"))

    words = toks.select("doc_id", F.explode("ws").alias("w"))
    wc = words.groupBy("doc_id", "w").count()
    wstats = wc.groupBy("doc_id").agg(
        F.max("count").alias("top_c"),
        F.sum("count").alias("n"),
        F.count(F.lit(1)).alias("n_uniq"),
    )

    n = F.size("ws")
    bigram = F.zip_with(
        F.slice("ws", 1, n - 1), F.slice("ws", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b))
    bg = toks.where(n >= 2).select("doc_id", F.explode(bigram).alias("b"))
    bc = bg.groupBy("doc_id", "b").count()
    bstats = bc.groupBy("doc_id").agg(
        F.max("count").alias("top_bc"), F.sum("count").alias("bn"))

    top_word = F.col("top_c").cast("double") / F.col("n")
    top_bigram = F.coalesce(F.col("top_bc").cast("double") / F.col("bn"),
                            F.lit(0.0))
    uniq = F.col("n_uniq").cast("double") / F.col("n")
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            F.round(top_word, 4).alias("top_word_frac"),
            F.round(top_bigram, 4).alias("top_bigram_frac"),
            F.round(uniq, 4).alias("unique_word_frac"),
            ((top_word > 0.15) | (top_bigram > 0.08) | (uniq < 0.4))
            .alias("repetitive"),
        )
    )
