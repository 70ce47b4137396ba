"""Training-corpus assembly queries: deterministic splits and
source-weighted mixing.

Both operators bucket rows by a salted MD5 of the stable document key —
never by ``rand()`` — so assignment is (a) reproducible across runs,
engines, cluster sizes, and partitionings, (b) stable under corpus
growth (a new document never flips an old one's split), and (c)
re-shuffleable by changing the salt. MD5 hex is identical in Spark and
DuckDB, so the oracle reproduces the exact assignment, not a
statistical approximation of it.

At 100 TB the split/mix is a narrow map-only transform (one hash + one
string compare per row, whole-stage codegen, no shuffle); the per-split
summary aggregates here exist so the oracle can value-check the
assignment.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from datalake_project_spark.catalog import Catalog
from datalake_project_spark.queries import register

SPLIT_SALT = ":split:42"

# Per-source sampling weights for the mixture query: hex prefix of the
# salted hash compared against floor(weight * 256) as a 2-hex-char
# threshold. 256 buckets => weights quantized to 1/256 ≈ 0.4%.
MIX_WEIGHTS = {"src0": 1.0, "src1": 0.75, "src2": 0.5, "src3": 0.25}
MIX_DEFAULT_WEIGHT = 0.1


def _bucket(key: Column, salt: str) -> Column:
    """First two hex chars of md5(key || salt) — 256 uniform buckets,
    compared lexicographically against hex thresholds."""
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 2)


def split_assign(df: DataFrame, key: str, salt: str = SPLIT_SALT,
                 train: float = 0.8, val: float = 0.1) -> DataFrame:
    """Add a ``split`` column: 'train'/'val'/'test' by hash bucket.

    Fractions quantize to 1/256. The same (key, salt) always lands in
    the same split, on any engine or cluster.
    """
    b = _bucket(F.col(key), salt)
    t_hi = format(int(train * 256), "02x")
    v_hi = format(int((train + val) * 256), "02x")
    return df.withColumn(
        "split",
        F.when(b < t_hi, "train").when(b < v_hi, "val").otherwise("test"))


@register(
    "q_split_train_test",
    oracle=f"""
    WITH assigned AS (
        SELECT CASE WHEN substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'), 1, 2)
                         < 'cc' THEN 'train'
                    WHEN substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'), 1, 2)
                         < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               n_chars, source
        FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT source) AS n_sources
    FROM assigned GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test split by salted MD5 of "
        "doc_id (no rand(): reproducible across engines/cluster sizes, "
        "stable under corpus growth). The oracle reproduces the exact "
        "per-split doc counts, char totals, and source coverage — a "
        "value check of the assignment itself, not a distribution test.",
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    return (split_assign(d, "doc_id")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.countDistinct("source").alias("n_sources")))


def mix_filter(df: DataFrame, key: str, source_col: str,
               weights: dict[str, float], default: float,
               salt: str = ":mix:7") -> DataFrame:
    """Keep each row with its source's sampling probability, decided by
    hash bucket — deterministic down-sampling for corpus mixing (e.g.
    up-weight curated sources, down-weight crawl). Map-only, no shuffle."""
    b = _bucket(F.col(key), salt)
    thr = F.lit(format(int(default * 256), "02x"))
    for src, w in weights.items():
        thr = F.when(F.col(source_col) == src,
                     format(min(int(w * 256), 256), "03x")[-2:]
                     if w < 1.0 else "zz").otherwise(thr)
    return df.where(b < thr)


@register(
    "q_corpus_mix",
    oracle="""
    WITH kept AS (
        SELECT source, n_chars,
               substr(md5(doc_id::VARCHAR || ':mix:7'), 1, 2) AS b
        FROM documents
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM kept
    WHERE b < CASE source WHEN 'src0' THEN 'zz' WHEN 'src1' THEN 'c0'
                          WHEN 'src2' THEN '80' WHEN 'src3' THEN '40'
                          ELSE '19' END
    GROUP BY source
    """,
    doc="Source-weighted corpus mixture: per-source keep probabilities "
        "(src0 1.0, src1 0.75, src2 0.5, src3 0.25, rest 0.1) applied "
        "as deterministic hash-bucket thresholds. The oracle reproduces "
        "the exact surviving set per source. This is the sampling-"
        "weights step of corpus assembly; at 100 TB it is a map-only "
        "filter fused into the scan.",
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    kept = mix_filter(d, "doc_id", "source", MIX_WEIGHTS, MIX_DEFAULT_WEIGHT)
    return (kept.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("n_chars").alias("total_chars")))


CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


@register(
    "q_corpus_chunk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    chunks AS (
        SELECT doc_id, t.i AS chunk_idx,
               array_to_string(
                   ws[t.i * {CHUNK_STRIDE} + 1 :
                      t.i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ') AS chunk_text,
               LEAST({CHUNK_TOKENS},
                     len(ws) - t.i * {CHUNK_STRIDE}) AS n_tokens
        FROM tok,
             unnest(range(0, GREATEST(1,
                 CAST(CEIL((len(ws) - {CHUNK_TOKENS})
                           / {CHUNK_STRIDE}.0) AS BIGINT) + 1))) AS t(i)
        WHERE len(ws) > 0)
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_text,
           CAST(n_tokens AS INT) AS n_tokens
    FROM chunks WHERE n_tokens > 0
    """,
    doc=f"Sliding-window document chunking ({CHUNK_TOKENS}-token chunks, "
        f"stride {CHUNK_STRIDE}): the embedding/RAG prep step that turns "
        "long documents into overlapping retrieval units with stable "
        "(doc_id, chunk_idx) identity. Map-side only — a sequence+"
        "transform builds the chunk list per row and explodes it, no "
        "shuffle at all; at 100 TB chunking fuses into the scan that "
        "feeds the embedding UDF.",
)
def q_corpus_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions.text import tokens

    d = Catalog(spark, sf_dir).table("documents")
    ws = tokens("text")
    n = F.size(ws)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - CHUNK_TOKENS) / F.lit(float(CHUNK_STRIDE))).cast("long") + 1)
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunk = (
        d.where(n > 0)
        .select("doc_id", ws.alias("_ws"),
                F.posexplode(idx).alias("_pos", "_i"))
        .select(
            "doc_id",
            F.col("_i").cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(
                "_ws", F.col("_i") * CHUNK_STRIDE + 1, CHUNK_TOKENS)).alias("chunk_text"),
            F.least(F.lit(CHUNK_TOKENS),
                    F.size("_ws") - F.col("_i") * CHUNK_STRIDE)
            .cast("int").alias("n_tokens"))
    )
    return chunk.where(F.col("n_tokens") > 0)


SAMPLE_N = 100


@register(
    "q_corpus_sample_fixed",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR || ':sample:13'),
                                  doc_id) AS rk
        FROM documents)
    SELECT doc_id, source, n_chars FROM ranked WHERE rk <= {SAMPLE_N}
    """,
    doc=f"Deterministic fixed-SIZE sample: exactly {SAMPLE_N} documents "
        "selected by ranking on a salted MD5 of the stable key (doc_id "
        "tie-break) — reproducible across engines, cluster sizes, and "
        "partitionings, unlike rand()-based sampling, and exact-N unlike "
        "the per-row Bernoulli of q_corpus_mix. At 100 TB the global "
        "top-N by hash runs as per-partition top-N + a tiny final merge "
        "(Spark's TakeOrderedAndProject), never a full sort.",
)
def q_corpus_sample_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample:13")))
    return (d.select("doc_id", "source", "n_chars", key.alias("_k"))
            .orderBy("_k", "doc_id")
            .limit(SAMPLE_N)
            .drop("_k"))


N_PACK_SHARDS = 8
PACK_BIN_TOKENS = 2048


@register(
    "q_pack_sequences_sharded",
    oracle=f"""
    WITH tc AS (
        SELECT doc_id, doc_id % {N_PACK_SHARDS} AS shard,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
        FROM documents),
    packed AS (
        SELECT shard, doc_id, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY shard
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                           - n_tokens) / {PACK_BIN_TOKENS}.0)
                    AS BIGINT) AS bin_id
        FROM tc)
    SELECT shard, bin_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY shard, bin_id
    """,
    doc=f"Shard-parallel sequence packing — the 100 TB formulation the "
        "global q_pack_sequences documents: the order key becomes "
        f"(shard, doc_id) with shard = doc_id % {N_PACK_SHARDS}, so each "
        "shard packs its running token count independently. One shuffle "
        "on shard, every shard's window runs in parallel (no global "
        "single-partition sort), and the assignment is deterministic "
        "for any shard count — this query value-checks the sharded "
        "assignment against the oracle, proving packing parallelizes "
        "without changing semantics within a shard.",
)
def q_pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from datalake_project_spark.functions import text as T

    d = Catalog(spark, sf_dir).table("documents")
    tc = d.select(
        "doc_id",
        (F.col("doc_id") % N_PACK_SHARDS).alias("shard"),
        T.token_count("text").alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    packed = tc.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens"))
                / F.lit(float(PACK_BIN_TOKENS))))
    return packed.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"))


@register(
    "q_corpus_overlap_matrix",
    oracle="""
    WITH words AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents),
    sh AS (
        SELECT DISTINCT source, u.s AS shingle
        FROM (SELECT source,
                     [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                      FOR i IN range(1, len(ws) - 1)] AS shingles
              FROM words WHERE len(ws) >= 3) t,
             unnest(t.shingles) AS u(s))
    SELECT a.source AS src_a, b.source AS src_b,
           COUNT(*) AS n_shared_shingles
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    doc="Inter-source duplication matrix: for every source pair, the "
        "number of distinct word-3-grams present in both — the corpus "
        "analytics view that tells a pipeline which sources re-host "
        "each other's content (mirror detection, crawl-overlap "
        "budgeting). Spark plan: one explode to the distinct "
        "(source, shingle) index (map-side-combined), then a self-join "
        "keyed on shingle — Σ df² over the SOURCE-level index, which is "
        "orders smaller than the document-level one; the same df-cap "
        "valve as n-gram dedup applies to boilerplate shingles at scale.",
)
def q_corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions import text as T
    from datalake_project_spark.functions.text import shingles

    d = Catalog(spark, sf_dir).table("documents")
    # the (source, shingle) index feeds BOTH sides of the self-join; a
    # lazy localCheckpoint materializes the corpus explode+distinct
    # once instead of per side (the q_text_collocations discipline)
    sh = (d.select("source", F.explode(shingles(T.tokens("text"), 3)).alias("shingle"))
          .distinct()
          .localCheckpoint(eager=False))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.source") < F.col("b.source")))
        .groupBy(F.col("a.source").alias("src_a"),
                 F.col("b.source").alias("src_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


@register(
    "q_corpus_card",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, source, n_chars,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
        FROM documents)
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           ROUND(AVG(n_tokens::DOUBLE), 2) AS avg_tokens
    FROM tok
    """,
    doc="Corpus card: the one-row dataset-datasheet summary every corpus "
        "release publishes (document/token/char totals, language and "
        "source coverage, length distribution bounds). A single "
        "full-scan aggregate with map-side partials — the cheapest "
        "query in the engine and the first one run on any new corpus.",
)
def q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions.text import token_count

    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select("lang", "source", "n_chars",
                   token_count("text").alias("n_tokens"))
    return tok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.round(F.avg(F.col("n_tokens").cast("double")), 2).alias("avg_tokens"))


@register(
    "q_corpus_length_histogram",
    oracle="""
    WITH tok AS (
        SELECT len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
        FROM documents)
    SELECT CAST(FLOOR(LN(n_tokens + 1) / LN(2.0)) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS bucket_min,
           CAST(MAX(n_tokens) AS BIGINT) AS bucket_max
    FROM tok GROUP BY 1
    """,
    doc="Corpus length distribution as log2-bucketed histogram (the "
        "companion plot of the corpus card; truncation/padding policy "
        "and packing efficiency are read straight off it). Integer "
        "bucket arithmetic (floor of log2(n+1)) keeps the histogram "
        "engine-exact; one scan, one tiny aggregate.",
)
def q_corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions.text import token_count

    d = Catalog(spark, sf_dir).table("documents")
    n = token_count("text")
    bucket = F.floor(F.log(2.0, n + 1)).cast("long")
    return (d.select(bucket.alias("log2_bucket"), n.alias("_n"))
            .groupBy("log2_bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min("_n").cast("long").alias("bucket_min"),
                 F.max("_n").cast("long").alias("bucket_max")))


@register(
    "q_corpus_dedup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           ROUND(1.0 - COUNT(DISTINCT md5(text))::DOUBLE / COUNT(*)::DOUBLE, 4)
               + 0.0 AS dup_rate
    FROM documents
    GROUP BY source
    """,
    doc="Per-source exact-duplicate rate — the observability panel a "
        "corpus pipeline watches per ingest (a source whose dup_rate "
        "jumps is re-crawling itself or mirroring another source; feeds "
        "the q_corpus_mix weights). Content addressing via md5 of the "
        "UTF-8 text (identical hex across engines), one groupBy with "
        "partial distinct-count aggregation — the 16-byte digest, not "
        "the document, is what shuffles at 100 TB.",
)
def q_corpus_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents")
    h = F.md5(F.col("text").cast("binary"))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.count_distinct(h).alias("n_unique"),
                 (F.round(F.lit(1.0)
                          - F.count_distinct(h).cast("double")
                          / F.count(F.lit(1)).cast("double"), 4)
                  + F.lit(0.0)).alias("dup_rate")))


TOKEN_BUDGET = 1_000_000


@register(
    "q_corpus_quota_allocation",
    oracle=f"""
    WITH w AS (
        SELECT source,
               CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS wt FROM w),
    base AS (
        SELECT source, n_tokens,
               ({TOKEN_BUDGET} * n_tokens) // tot.wt AS base_quota,
               ({TOKEN_BUDGET} * n_tokens) % tot.wt AS rem
        FROM w CROSS JOIN tot),
    r AS (SELECT CAST({TOKEN_BUDGET} - SUM(base_quota) AS BIGINT) AS extra
          FROM base),
    ranked AS (
        SELECT source, n_tokens, base_quota, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rk
        FROM base)
    SELECT source, n_tokens,
           CAST(base_quota + CASE WHEN rk <= (SELECT extra FROM r)
                                  THEN 1 ELSE 0 END AS BIGINT) AS quota
    FROM ranked
    """,
    doc=f"Token-budget apportionment by the largest-remainder (Hamilton) "
        f"method: a {TOKEN_BUDGET:,}-token training budget split across "
        "sources proportionally to their token mass, floor quotas plus "
        "one extra token to the largest remainders until the budget is "
        "exact — Σquota == budget by construction, pure integer "
        "arithmetic (hash-exact). The planning step that turns "
        "q_corpus_mix weights into exact per-source sample sizes. "
        "Spark plan: the remainder ranking is a self-join over the "
        "SOURCES table (tiny at any corpus scale) rather than a "
        "global-order window, so the plan stays partition-clean; the "
        "budget residue is a broadcast 1-row aggregate, no driver "
        "action.",
)
def q_corpus_quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions import text as T

    d = Catalog(spark, sf_dir).table("documents")
    w = (d.groupBy("source")
         .agg(F.sum(F.size(T.tokens("text"))).cast("long").alias("n_tokens")))
    tot = w.agg(F.sum("n_tokens").cast("long").alias("wt"))
    n = F.lit(TOKEN_BUDGET)
    scaled = n * F.col("n_tokens")
    base = (w.crossJoin(F.broadcast(tot))
            .withColumn("rem", F.pmod(scaled, F.col("wt")))
            .withColumn("base_quota",
                        ((scaled - F.pmod(scaled, F.col("wt")))
                         / F.col("wt")).cast("long")))
    # no localCheckpoint: this query is pinned fully declarative
    # (tests/test_plans.py construction probe), and under AQE even an
    # eager=False checkpoint materializes shuffle stages at construction
    extra = base.agg((n - F.sum("base_quota")).cast("long").alias("extra"))
    a, b = base.alias("a"), base.alias("b")
    ranked = (a.join(b.select(F.col("source").alias("b_source"),
                              F.col("rem").alias("b_rem")),
                     (F.col("b_rem") > a["rem"])
                     | ((F.col("b_rem") == a["rem"])
                        & (F.col("b_source") < a["source"])), "left")
              .groupBy(a["source"], a["n_tokens"], a["base_quota"])
              .agg(F.count("b_source").alias("n_ahead")))
    return (ranked.crossJoin(F.broadcast(extra))
            .select("source", "n_tokens",
                    (F.col("base_quota")
                     + F.when(F.col("n_ahead") < F.col("extra"), 1)
                     .otherwise(0)).cast("long").alias("quota")))


MIX_ALPHA = 0.5  # sampling temperature exponent (alpha-smoothing)


@register(
    "q_corpus_temperature_mix",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
        FROM documents),
    per AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS n_tokens
            FROM tok GROUP BY source),
    tot AS (SELECT SUM(n_tokens)::DOUBLE AS t FROM per),
    p AS (SELECT source, n_tokens, n_tokens / tot.t AS p
          FROM per CROSS JOIN tot),
    z AS (SELECT SUM(pow(p, {MIX_ALPHA})) AS z FROM p)
    SELECT source, n_tokens,
           ROUND(p, 6) + 0.0 AS share,
           ROUND(pow(p, {MIX_ALPHA}) / z.z, 6) + 0.0 AS sample_weight
    FROM p CROSS JOIN z
    """,
    doc=f"Temperature-based source mixing weights (alpha={MIX_ALPHA} "
        "exponent smoothing, the multilingual-sampling scheme of "
        "Conneau & Lample 2019): per-source token share p_s and "
        "smoothed sampling weight p_s^alpha / sum(p^alpha) — the step "
        "between measuring a corpus (corpus card) and apportioning a "
        "token budget (quota allocation): upweights tail sources, "
        "downweights heads. One corpus pass; both normalizers are "
        "broadcast 1-row aggregates over the source-sized table, so "
        "the whole query is one DAG with no mid-plan actions.",
)
def q_corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions import text as T

    d = Catalog(spark, sf_dir).table("documents")
    per = (d.select("source", T.token_count("text").alias("nt"))
           .groupBy("source").agg(F.sum("nt").alias("n_tokens")))
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"))
    p = (per.crossJoin(F.broadcast(tot))
         .withColumn("p", F.col("n_tokens") / F.col("t")))
    z = p.agg(F.sum(F.pow("p", MIX_ALPHA)).alias("z"))
    return (p.crossJoin(F.broadcast(z))
            .select("source", "n_tokens",
                    (F.round(F.col("p"), 6) + F.lit(0.0)).alias("share"),
                    (F.round(F.pow("p", MIX_ALPHA) / F.col("z"), 6)
                     + F.lit(0.0)).alias("sample_weight")))


@register(
    "q_corpus_release",
    oracle="""
    WITH tok AS (
        SELECT doc_id, text, source,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        FROM documents),
    feat AS (
        SELECT doc_id, text, source, len(toks) AS n_tokens,
               ROUND(GREATEST(0.0, LEAST(1.0,
                   0.5 * LEAST(1.0, ln(1.0 + len(toks)::DOUBLE) / ln(101.0))
                   + 0.3 * LEAST(1.0, (CASE WHEN len(toks) > 0 THEN
                       len(list_filter(toks, t -> t IN
                           ('the','a','and','of','to','in','is','it')))::DOUBLE
                       / len(toks)::DOUBLE ELSE 0.0 END) * 5.0)
                   - 0.3 * LEAST(1.0, (CASE WHEN length(text) > 0 THEN
                       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))::DOUBLE
                       / length(text)::DOUBLE ELSE 0.0 END) * 4.0)
                   - (CASE WHEN len(toks) > 0 AND
                           (list_sum(list_transform(toks, t -> len(t)))::DOUBLE
                            / len(toks)::DOUBLE < 2.0
                            OR list_sum(list_transform(toks, t -> len(t)))::DOUBLE
                            / len(toks)::DOUBLE > 12.0)
                      THEN 0.5 ELSE 0.0 END) * 0.2)), 4) AS quality
        FROM tok),
    clean AS (
        SELECT * FROM feat
        WHERE n_tokens BETWEEN 10 AND 5000 AND quality >= 0.3),
    deduped AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM clean) WHERE rn = 1),
    assigned AS (
        SELECT CASE WHEN substr(md5(doc_id::VARCHAR || ':split:42'), 1, 2)
                         < 'cc' THEN 'train'
                    WHEN substr(md5(doc_id::VARCHAR || ':split:42'), 1, 2)
                         < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               n_tokens, source
        FROM deduped)
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           COUNT(DISTINCT source) AS n_sources
    FROM assigned GROUP BY split
    """,
    doc="Corpus RELEASE manifest — the capstone composition a corpus "
        "team ships: quality/length cleaning gate (q_corpus_clean_"
        "funnel's core filters) -> exact-content dedup (keep-first per "
        "md5, q_dedup_exact_text's rule) -> deterministic hash split "
        "(q_split_train_test's assignment) -> per-split doc/token/"
        "source manifest. One linear DAG: map-only filters fused into "
        "the scan, one shuffle for the dedup keep-first, one for the "
        "manifest aggregate; at 100 TB every stage is a pattern "
        "already proven individually — this query stamps their "
        "COMPOSITION.",
)
def q_corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from datalake_project_spark.functions.text import quality_score
    from datalake_project_spark.functions.text import tokens as toks_fn

    d = Catalog(spark, sf_dir).table("documents")
    toks = toks_fn("text")
    feat = d.select(
        "doc_id", "text", "source",
        F.size(toks).alias("n_tokens"),
        F.round(quality_score(F.col("text"), toks), 4).alias("quality"))
    clean = feat.where(F.col("n_tokens").between(10, 5000)
                       & (F.col("quality") >= 0.3))
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (clean.withColumn("rn", F.row_number().over(w))
               .where(F.col("rn") == 1))
    assigned = split_assign(deduped, "doc_id")
    return (assigned.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 F.countDistinct("source").alias("n_sources")))


WSAMPLE_N = 50
WSAMPLE_SALT = ":wsample:3"


@register(
    "q_corpus_weighted_sample",
    oracle=f"""
    WITH k AS (
        SELECT doc_id, source, n_chars,
               (('0x' || substr(md5(doc_id::VARCHAR || '{WSAMPLE_SALT}'),
                               1, 8))::BIGINT + 1) / 4294967296.0 AS u
        FROM documents WHERE n_chars > 0)
    SELECT doc_id, source, n_chars,
           ROUND(ln(u) / n_chars, 8) + 0.0 AS es_key
    FROM k ORDER BY es_key DESC, doc_id LIMIT {WSAMPLE_N}
    """,
    doc=f"Weighted sampling without replacement (Efraimidis-Spirakis "
        f"A-Res): top-{WSAMPLE_N} documents by key ln(u)/w with "
        "deterministic hash-uniform u and weight w = n_chars — "
        "inclusion probability proportional to document length, "
        "reproducible on any engine or cluster (no rand()). The "
        "length-weighted companion of q_corpus_sample_fixed's uniform "
        "sample: one map-side key computation, top-N via "
        "TakeOrderedAndProject (per-partition top-N + tiny merge, no "
        "global sort) — the standard one-pass distributed weighted "
        "sampler at any scale.",
)
def q_corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = Catalog(spark, sf_dir).table("documents").where(F.col("n_chars") > 0)
    hexpart = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"),
                       F.lit(WSAMPLE_SALT))), 1, 8)
    u = (F.conv(hexpart, 16, 10).cast("long") + 1) / F.lit(4294967296.0)
    key = (F.round(F.log(u) / F.col("n_chars"), 8) + F.lit(0.0))
    return (d.select("doc_id", "source", "n_chars", key.alias("es_key"))
            .orderBy(F.desc("es_key"), "doc_id").limit(WSAMPLE_N))


@register(
    "q_split_balance_audit",
    oracle="""
    WITH assigned AS (
        SELECT CASE WHEN substr(md5(doc_id::VARCHAR || ':split:42'), 1, 2)
                         < 'cc' THEN 'train'
                    WHEN substr(md5(doc_id::VARCHAR || ':split:42'), 1, 2)
                         < 'e6' THEN 'val'
                    ELSE 'test' END AS split,
               n_chars,
               len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nt
        FROM documents),
    g AS (SELECT AVG(nt) AS gm FROM assigned)
    SELECT split,
           COUNT(*) AS n_docs,
           ROUND(AVG(nt), 2) + 0.0 AS mean_tokens,
           ROUND(SQRT(GREATEST(AVG(nt * nt) - AVG(nt) * AVG(nt), 0)), 2)
               + 0.0 AS std_tokens,
           ROUND(ABS(AVG(nt) - g.gm) / g.gm, 4) + 0.0 AS mean_drift
    FROM assigned CROSS JOIN g
    GROUP BY split, g.gm
    """,
    doc="Split-balance audit: per split, document count, token-length "
        "moments, and the relative drift of the split mean from the "
        "corpus mean — the randomization check that catches a broken "
        "hash salt or a length-correlated assignment before anyone "
        "trusts val/test numbers (a sound hash split drifts by "
        "O(1/sqrt(n))). One scan, per-split two-moment aggregates, "
        "the corpus mean as a broadcast 1-row aggregate; variance "
        "clamped against float cancellation as elsewhere.",
)
def q_split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions import text as T

    d = Catalog(spark, sf_dir).table("documents")
    assigned = split_assign(
        d.select("doc_id", T.token_count("text").alias("nt")), "doc_id")
    g = assigned.agg(F.avg("nt").alias("gm"))
    return (assigned.crossJoin(F.broadcast(g))
            .groupBy("split", "gm")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.round(F.avg("nt"), 2) + F.lit(0.0)).alias("mean_tokens"),
                 (F.round(F.sqrt(F.greatest(
                     F.avg(F.col("nt") * F.col("nt"))
                     - F.avg("nt") * F.avg("nt"), F.lit(0.0))), 2)
                  + F.lit(0.0)).alias("std_tokens"),
                 (F.round(F.abs(F.avg("nt") - F.col("gm")) / F.col("gm"), 4)
                  + F.lit(0.0)).alias("mean_drift"))
            .drop("gm"))


SAMPLE_N = 100  # total documents drawn by the quota-exact sampler
QS_SALT = ":qs:4"


@register(
    "q_corpus_quota_sample",
    oracle=f"""
    WITH w AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS wt FROM w),
    base AS (SELECT source, n_docs,
                    ({SAMPLE_N} * n_docs) // tot.wt AS bq,
                    ({SAMPLE_N} * n_docs) % tot.wt AS rem
             FROM w CROSS JOIN tot),
    r AS (SELECT CAST({SAMPLE_N} - SUM(bq) AS BIGINT) AS extra FROM base),
    ranked AS (SELECT source, bq, rem,
                      ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
               FROM base),
    quota AS (SELECT source,
                     CAST(bq + CASE WHEN rk <= (SELECT extra FROM r)
                                    THEN 1 ELSE 0 END AS BIGINT) AS q
              FROM ranked),
    drawn AS (SELECT doc_id, source,
                     ROW_NUMBER() OVER (
                         PARTITION BY source
                         ORDER BY md5(doc_id::VARCHAR || '{QS_SALT}'),
                                  doc_id) AS rk
              FROM documents)
    SELECT d.doc_id, d.source
    FROM drawn d JOIN quota USING (source)
    WHERE d.rk <= quota.q
    """,
    doc=f"Quota-EXACT stratified draw: the Hamilton apportionment "
        f"(q_corpus_quota_allocation's integer arithmetic, here over "
        f"doc counts) fixes per-source quotas summing to exactly "
        f"{SAMPLE_N}, then each source contributes its first "
        "quota-many documents in salted-MD5 order — the drawn sample "
        "itself, completing the plan->draw arc "
        "(q_sample_stratified keeps a RATE per stratum; this draws an "
        "exact COUNT). Deterministic: no rand() anywhere, the same "
        "sample on any engine or cluster size. Spark plan: quotas via "
        "the bounded sources-table self-join (no global window), the "
        "draw via a per-source keyed window over the hash order — "
        "at 100 TB that is one shuffle on source with "
        "early-stopping-friendly rank<=q selection, and the quota "
        "table broadcasts.",
)
def q_corpus_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = Catalog(spark, sf_dir).table("documents")
    w = d.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    tot = w.agg(F.sum("n_docs").cast("long").alias("wt"))
    n = F.lit(SAMPLE_N)
    scaled = n * F.col("n_docs")
    base = (w.crossJoin(F.broadcast(tot))
            .withColumn("rem", F.pmod(scaled, F.col("wt")))
            .withColumn("bq", ((scaled - F.pmod(scaled, F.col("wt")))
                               / F.col("wt")).cast("long"))
            .localCheckpoint(eager=False))
    extra = base.agg((n - F.sum("bq")).cast("long").alias("extra"))
    a = base.alias("a")
    b = base.select(F.col("source").alias("b_source"),
                    F.col("rem").alias("b_rem"))
    ranked = (a.join(F.broadcast(b),
                     (F.col("b_rem") > a["rem"])
                     | ((F.col("b_rem") == a["rem"])
                        & (F.col("b_source") < a["source"])), "left")
              .groupBy(a["source"], a["bq"])
              .agg(F.count("b_source").alias("n_ahead")))
    quota = (ranked.crossJoin(F.broadcast(extra))
             .select("source",
                     (F.col("bq")
                      + F.when(F.col("n_ahead") < F.col("extra"), 1)
                      .otherwise(0)).cast("long").alias("q")))

    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(QS_SALT)))
    win = Window.partitionBy("source").orderBy(h, "doc_id")
    drawn = (d.select("doc_id", "source")
             .withColumn("rk", F.row_number().over(win)))
    return (drawn.join(F.broadcast(quota), "source")
            .where(F.col("rk") <= F.col("q"))
            .select("doc_id", "source"))


@register(
    "q_split_ngram_leakage",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, text,
               CASE WHEN substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'), 1, 2)
                         < 'cc' THEN 'train'
                    WHEN substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'), 1, 2)
                         < 'e6' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
    words AS (
        SELECT split,
               list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                           w -> w <> '') AS ws
        FROM assigned),
    sh AS (
        SELECT DISTINCT split,
               unnest(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                                     FOR i IN range(1, len(ws) - 1)])) AS s
        FROM words WHERE len(ws) >= 3),
    tr AS (SELECT s FROM sh WHERE split = 'train'),
    te AS (SELECT split, s FROM sh WHERE split <> 'train'),
    per AS (SELECT split, COUNT(*) AS n_shingles,
                   COUNT(CASE WHEN s IN (SELECT s FROM tr) THEN 1 END)
                       AS n_in_train
            FROM te GROUP BY split)
    SELECT split, n_shingles, n_in_train,
           ROUND(n_in_train::DOUBLE / n_shingles, 6) + 0.0 AS leak_rate
    FROM per
    """,
    doc="Cross-split n-gram leakage: for each held-out split, the "
        "fraction of its distinct word-3-grams that also appear in "
        "TRAIN — the classic contamination check between a model's own "
        "splits (q_split_embedding_leakage catches paraphrase-level "
        "leakage the n-grams miss; this catches verbatim leakage the "
        "embeddings blur). Uses the exact salted-MD5 assignment of "
        "q_split_train_test; the train shingle set semi-joins into the "
        "held-out sets (at 100 TB: hashed 8-byte keys, the shingle "
        "index the dedup family already builds). Integer tallies plus "
        "a 6-dp ratio of ints — hash-exact.",
)
def q_split_ngram_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions.text import shingles, tokens

    d = Catalog(spark, sf_dir).table("documents")
    assigned = split_assign(d, "doc_id")
    sh = (assigned.select("split",
                          F.explode(shingles(tokens("text"), 3)).alias("s"))
          .distinct()
          .localCheckpoint(eager=False))  # feeds train side and held-out side
    tr = sh.where(F.col("split") == "train").select("s")
    te = sh.where(F.col("split") != "train")
    hit = (te.join(tr.withColumn("_hit", F.lit(1)).distinct(), "s", "left")
           .groupBy("split")
           .agg(F.count(F.lit(1)).alias("n_shingles"),
                F.count("_hit").alias("n_in_train")))
    return hit.select(
        "split", "n_shingles", "n_in_train",
        (F.round(F.col("n_in_train").cast("double")
                 / F.col("n_shingles"), 6) + F.lit(0.0)).alias("leak_rate"))


@register(
    "q_corpus_budget_select",
    oracle="""
    WITH ta AS (
        SELECT doc_id, source,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
        FROM documents),
    t AS (
        SELECT doc_id, source, len(arr) AS toks,
               len(list_distinct(arr))::DOUBLE / len(arr) AS score
        FROM ta WHERE len(arr) > 0),
    b AS (SELECT CAST(FLOOR(0.25 * SUM(toks)) AS BIGINT) AS budget FROM t),
    r AS (
        SELECT t.*, COALESCE(SUM(toks) OVER (
                   ORDER BY score DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum
        FROM t),
    sel AS (SELECT r.* FROM r, b WHERE r.cum < b.budget)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS n_tokens
    FROM sel GROUP BY source
    """,
    doc="Token-budget data selection: rank every document by a quality "
        "score (distinct-token ratio — a repetition penalty) and keep "
        "the best docs until a fixed token budget (25% of corpus "
        "tokens) is spent — the 'select the best N-billion tokens' "
        "step between scoring and training-set assembly in an LLM "
        "pipeline. The greedy cutoff needs a corpus-wide running sum "
        "in score order, which runs with the sharded-window "
        "discipline: shard = floor((1-score)*16) is monotone in the "
        "sort key (ties share a shard since the shard is a function "
        "of the score), per-shard exclusive prefix sums, broadcast "
        "cross-shard offsets — no single-partition WindowExec. All "
        "cumulative quantities are INTEGER token counts (exact, "
        "order-independent) and scores are single-division doubles "
        "(bit-identical both engines), so the selection boundary is "
        "deterministic. Docs whose exclusive prefix is under budget "
        "are kept (the standard greedy that may overshoot by one "
        "doc).",
)
def q_corpus_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions.text import tokens

    d = Catalog(spark, sf_dir).table("documents")
    arr = tokens(F.col("text"))
    t = (d.select("doc_id", "source", arr.alias("arr"))
         .where(F.size("arr") > 0)
         .select("doc_id", "source", F.size("arr").alias("toks"),
                 (F.size(F.array_distinct("arr")).cast("double")
                  / F.size("arr")).alias("score")))
    b = t.agg(F.floor(0.25 * F.sum("toks")).cast("long").alias("budget"))

    from pyspark.sql.window import Window
    sharded = t.withColumn(
        "shard", F.floor((F.lit(1.0) - F.col("score")) * 16).cast("int"))
    w_ex = (Window.partitionBy("shard")
            .orderBy(F.desc("score"), "doc_id")
            .rowsBetween(Window.unboundedPreceding, -1))
    intra = sharded.withColumn(
        "cum_intra", F.coalesce(F.sum("toks").over(w_ex), F.lit(0)))
    stot = sharded.groupBy("shard").agg(F.sum("toks").alias("s_toks"))
    below = (stot.alias("a")
             .join(F.broadcast(stot.alias("b")),
                   F.col("b.shard") < F.col("a.shard"), "left")
             .groupBy(F.col("a.shard").alias("shard"))
             .agg(F.coalesce(F.sum("b.s_toks"), F.lit(0)).alias("cum_shards")))
    sel = (intra.join(F.broadcast(below), "shard")
           .crossJoin(F.broadcast(b))
           .where(F.col("cum_shards") + F.col("cum_intra")
                  < F.col("budget")))
    return (sel.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("toks").cast("long").alias("n_tokens")))


@register(
    "q_corpus_epoch_plan",
    oracle="""
    WITH t AS (
        SELECT source,
               CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                    AS BIGINT) AS n_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS all_toks,
                   COUNT(*) AS n_sources FROM t)
    SELECT t.source, t.n_tokens,
           CAST(FLOOR(2.0 * tot.all_toks / tot.n_sources) AS BIGINT)
               AS budget_tokens,
           CAST(FLOOR((2.0 * tot.all_toks / tot.n_sources)
                      / t.n_tokens) AS BIGINT) AS full_epochs,
           ROUND((2.0 * tot.all_toks / tot.n_sources) / t.n_tokens, 4)
               + 0.0 AS epochs
    FROM t, tot
    """,
    doc="Per-source epoch plan: given a training token budget (here "
        "2x the corpus, split equally across sources — the "
        "upsampling scenario), how many passes over each source the "
        "budget implies (epochs = source budget / source tokens, with "
        "the integer full-epoch count separated from the fractional "
        "tail) — the repetition table data-mixing recipes publish "
        "(small curated sources run many epochs, big crawl slices "
        "fractions of one) and the q_corpus_quota_allocation "
        "counterpart when the knob is repetition rather than "
        "sampling. One token-count rollup (map-side partials) plus a "
        "broadcast 1-row total; token counts integer-exact, the "
        "epoch ratio one shared division.",
)
def q_corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions.text import tokens

    d = Catalog(spark, sf_dir).table("documents")
    t = (d.select("source", F.size(tokens(F.col("text"))).alias("nt"))
         .groupBy("source").agg(F.sum("nt").cast("long").alias("n_tokens")))
    tot = t.agg(F.sum("n_tokens").alias("all_toks"),
                F.count(F.lit(1)).alias("n_sources"))
    budget = F.lit(2.0) * F.col("all_toks") / F.col("n_sources")
    return (t.crossJoin(F.broadcast(tot))
            .select("source", "n_tokens",
                    F.floor(F.lit(2.0) * F.col("all_toks")
                            / F.col("n_sources")).cast("long")
                    .alias("budget_tokens"),
                    F.floor(budget / F.col("n_tokens")).cast("long")
                    .alias("full_epochs"),
                    (F.round(budget / F.col("n_tokens"), 4) + F.lit(0.0))
                    .alias("epochs")))


# --------------------------------------------------------------------------
# Adversarial split validation — can ANY feature tell train from test?
# --------------------------------------------------------------------------

@register(
    "q_split_adversarial_audit",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, n_chars,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
               CASE WHEN substr(md5(doc_id::VARCHAR || '{SPLIT_SALT}'),
                                1, 2) < 'cc' THEN 1 ELSE 0 END AS is_train
        FROM documents),
    feat AS (
        SELECT is_train,
               ROUND(CAST(len(toks) AS DOUBLE)
                     / GREATEST(n_chars, 1), 4) AS f
        FROM tok),
    r AS (SELECT is_train AS li,
                 RANK() OVER (ORDER BY f)
                 + (COUNT(*) OVER (PARTITION BY f) - 1) / 2.0 AS arank
          FROM feat),
    t AS (SELECT SUM(CASE WHEN li = 1 THEN arank ELSE 0.0 END) AS rsum,
                 COUNT(CASE WHEN li = 1 THEN 1 END) AS p,
                 COUNT(CASE WHEN li = 0 THEN 1 END) AS n
          FROM r)
    SELECT CAST(p AS BIGINT) AS n_train,
           CAST(n AS BIGINT) AS n_holdout,
           ROUND((rsum - p * (p + 1) / 2.0)
                 / (p::DOUBLE * n::DOUBLE), 6) + 0.0 AS adversarial_auc,
           ABS((rsum - p * (p + 1) / 2.0) / (p::DOUBLE * n::DOUBLE)
               - 0.5) < 0.05 AS split_looks_iid
    FROM t
    """,
    doc="Adversarial validation of the train/holdout split: the "
        "Mann-Whitney AUC of a document feature (token density, "
        "tokens per char, 4-dp histogram) at distinguishing train "
        "from val+test under the SAME salted-hash assignment the "
        "corpus release uses. If the split is truly random, no "
        "feature can beat AUC 0.5 — a deviation means the split "
        "correlates with content (time-ordered ids, source-clustered "
        "hashing, preprocessing drift) and every honest eval number "
        "is suspect. This is the leakage audit run BEFORE training; "
        "complements q_split_embedding_leakage (near-dup leakage "
        "across the boundary) and q_split_balance_audit (marginal "
        "balance). Engine side reuses the bounded-histogram AUC "
        "(decile-sharded prefix sums, no single-partition window); "
        "the assignment and counts are hash-exact.",
)
def q_split_adversarial_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_project_spark.functions import text as T
    from datalake_project_spark.queries.ml import histogram_auc

    d = Catalog(spark, sf_dir).table("documents")
    a = split_assign(d, "doc_id")
    feat = a.select(
        (F.col("split") == "train").alias("label"),
        F.round(F.size(T.tokens("text")).cast("double")
                / F.greatest(F.col("n_chars"), F.lit(1)), 4).alias("prob"))
    auc = histogram_auc(feat.select("prob", "label"))
    return auc.select(
        F.col("n_pos").cast("long").alias("n_train"),
        F.col("n_neg").cast("long").alias("n_holdout"),
        F.col("auc").alias("adversarial_auc"),
        (F.abs(F.col("auc") - 0.5) < 0.05).alias("split_looks_iid"))


# --------------------------------------------------------------------------
# Sequential Poisson sampling — one-pass weighted sample without replacement
# --------------------------------------------------------------------------

@register(
    "q_corpus_sequential_poisson",
    oracle="""
    WITH pri AS (
        SELECT doc_id, source, n_chars,
               ((1103515245 * doc_id + 12345) % 2147483648)::DOUBLE
                   / n_chars AS xi
        FROM documents WHERE n_chars > 0),
    ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (ORDER BY xi ASC, doc_id ASC) AS rk
        FROM pri)
    SELECT doc_id, source, n_chars, rk AS sample_rank
    FROM ranked WHERE rk <= 20 ORDER BY rk
    """,
    doc="Sequential Poisson sampling (Ohlsson '98) — the one-pass "
        "weighted-without-replacement sample a 100 TB corpus draw "
        "actually uses: give each doc the priority xi = u_i / w_i "
        "(u_i uniform, w_i = n_chars the size weight) and keep the n "
        "smallest — a length-biased pi-ps sample computed as ONE "
        "TakeOrdered over the corpus, no per-stratum pass, no second "
        "scan, mergeable across partitions (each partition's local "
        "top-n suffices — the same property that makes top-k "
        "distributed). u_i is the 31-bit LCG of doc_id, so the draw "
        "is reproducible and the oracle recomputes it exactly; the "
        "priority is one integer-exact division (IEEE division is "
        "correctly rounded, so both engines order identical doubles "
        "identically — no transcendental in sight, unlike the "
        "exp-keys A-ES variant whose u^(1/w) pow() is not "
        "cross-engine-stable). Weighted + deterministic + one pass + "
        "mergeable = the corpus-release draw (q_corpus_quota_sample) "
        "generalized from quota-exact to probability-proportional-"
        "to-size.",
)
def q_corpus_sequential_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = Catalog(spark, sf_dir).table("documents").where(F.col("n_chars") > 0)
    xi = (((1103515245 * F.col("doc_id") + 12345) % (2 ** 31))
          .cast("double") / F.col("n_chars"))
    # orderBy().limit(n) plans as TakeOrdered (per-partition local top-n,
    # driver merge) — the one-pass mergeable draw the doc promises. The
    # rank window runs over ONLY the 20 survivors, never the corpus, so
    # no global single-partition data-scale window exists in this plan.
    top = (d.select("doc_id", "source", "n_chars", xi.alias("xi"))
           .orderBy(F.asc("xi"), F.asc("doc_id")).limit(20))
    w = Window.orderBy(F.asc("xi"), F.asc("doc_id"))
    return (top.withColumn("sample_rank", F.row_number().over(w))
            .select("doc_id", "source", "n_chars", "sample_rank")
            .orderBy("sample_rank"))


# --------------------------------------------------------------------------
# Rendezvous (HRW) sharding — balance + minimal-movement, value-checked
# --------------------------------------------------------------------------

@register(
    "q_shard_rendezvous",
    oracle="""
    WITH shards8 AS (SELECT unnest(range(0, 8)) AS sh),
    shards9 AS (SELECT unnest(range(0, 9)) AS sh),
    a8 AS (
        SELECT d.doc_id,
               (SELECT s.sh FROM shards8 s
                ORDER BY (1103515245 * (((d.doc_id % 2147483647) * 64
                                         + s.sh) % 2147483647) + 12345)
                         % 2147483647 DESC, s.sh ASC
                LIMIT 1) AS shard
        FROM documents d),
    a9 AS (
        SELECT d.doc_id,
               (SELECT s.sh FROM shards9 s
                ORDER BY (1103515245 * (((d.doc_id % 2147483647) * 64
                                         + s.sh) % 2147483647) + 12345)
                         % 2147483647 DESC, s.sh ASC
                LIMIT 1) AS shard
        FROM documents d),
    moved AS (
        SELECT COUNT(*) AS n_moved
        FROM a8 JOIN a9 USING (doc_id) WHERE a8.shard <> a9.shard),
    bal AS (
        SELECT MAX(c)::DOUBLE / MIN(c) AS imbalance
        FROM (SELECT COUNT(*) AS c FROM a8 GROUP BY shard))
    SELECT (SELECT COUNT(*) FROM documents)::BIGINT AS n_docs,
           (SELECT n_moved FROM moved)::BIGINT AS n_moved,
           ROUND((SELECT n_moved FROM moved)::DOUBLE
                 / (SELECT COUNT(*) FROM documents), 4) AS moved_frac,
           (SELECT n_moved FROM moved)::DOUBLE
               / (SELECT COUNT(*) FROM documents) < 0.25 AS minimal_movement,
           ROUND((SELECT imbalance FROM bal), 4) AS imbalance_8
    """,
    doc="Rendezvous / highest-random-weight sharding (Thaler-Ravishankar) "
        "— the stateless data-placement rule a 100 TB ingest uses to "
        "route documents to shards/writers: doc goes to the shard with "
        "the highest hash(doc, shard) weight (portable LCG over "
        "(doc_id mod P)*64+shard reduced mod P again before the "
        "multiply, so the product never overflows BIGINT at any id "
        "range, deterministic in both engines; shard-id tie-break). VALUE-checked properties, not vibes: (a) balance — "
        "max/min shard occupancy at 8 shards; (b) MINIMAL MOVEMENT — "
        "growing 8 -> 9 shards re-routes only the docs whose new shard "
        "9 wins the per-doc tournament, expected 1/9 ~ 11% of keys "
        "(asserted < 25%), versus ~8/9 movement under the naive "
        "doc_id % n_shards rule. That property is why consistent "
        "placement schemes exist: resharding cost is proportional to "
        "the CHANGE in capacity, not the corpus. Plan shape: the "
        "per-doc tournament is an 8-row unrolled MAX over a broadcast "
        "shard table — one projection pass, no shuffle until the "
        "occupancy census.",
)
def q_shard_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    P = 2147483647
    d = Catalog(spark, sf_dir).table("documents").select("doc_id")

    def assign(n: int):
        # per-doc tournament: argmax over n (weight, shard) structs —
        # greatest() over struct literals keeps it one JVM projection.
        # doc_id is reduced mod P BEFORE the multiply (and the *64+s mixed
        # key again) so the LCG operand stays <= P and the 1103515245*x
        # product stays under 2^63 for ANY id range — the scale ladder's
        # stride-offset ids (> 1.3e8) silently wrapped on long overflow
        # in Spark while DuckDB raised.
        pairs = [F.struct(
            ((1103515245 * (((F.col("doc_id") % P) * 64 + F.lit(s)) % P)
              + 12345) % P)
            .alias("w"),
            F.lit(-s).alias("negsh"))  # ties -> smallest shard id wins
            for s in range(n)]
        return (-F.greatest(*pairs)["negsh"]).cast("long") \
            if n > 1 else F.lit(0).cast("long")

    both = d.select(
        "doc_id", assign(8).alias("s8"), assign(9).alias("s9")) \
        .localCheckpoint(eager=False)
    occ = (both.groupBy("s8").agg(F.count(F.lit(1)).alias("c"))
           .agg((F.max("c").cast("double") / F.min("c"))
                .alias("imbalance")))
    n_docs = F.broadcast(both.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")))
    moved = F.broadcast(
        both.where(F.col("s8") != F.col("s9"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_moved")))
    frac = F.col("n_moved").cast("double") / F.col("n_docs")
    return (n_docs.crossJoin(moved).crossJoin(F.broadcast(occ))
            .select("n_docs", "n_moved",
                    F.round(frac, 4).alias("moved_frac"),
                    (frac < 0.25).alias("minimal_movement"),
                    F.round("imbalance", 4).alias("imbalance_8")))
