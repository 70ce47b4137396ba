"""Data-quality audit — the constraint-validation pass a lake engine
runs before promoting a layer (the Deequ/Great-Expectations shape, as
plain aggregates).

The reference validates nothing on ingest (its enrichment swallows
errors, `scripts/script_api_apify_to_spark.py:227-232`); a production
medallion promotes raw → formatted only behind checks like these. Each
check is ONE aggregate over its table (count of violations — integer,
hash-exact); the audit result is the union of the 1-row check outputs,
so the whole battery is a handful of independent scans that Catalyst
prunes to the checked columns, no joins except the referential check's
anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from datalake_project_spark.catalog import Catalog
from datalake_project_spark.queries import local_df, register


@register(
    "q_data_quality_audit",
    oracle="""
    SELECT 'orders_pk_duplicates' AS check_name,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_violations
    FROM (SELECT o_orderkey, COUNT(*) AS n FROM orders
          GROUP BY o_orderkey HAVING COUNT(*) > 1)
    UNION ALL
    SELECT 'orders_fk_customer_missing',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_qty_out_of_range',
           CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'customer_name_null',
           CAST(COUNT(*) FILTER (WHERE c_name IS NULL) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'events_ts_null',
           CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_text_empty',
           CAST(COUNT(*) FILTER (WHERE text IS NULL OR length(text) = 0)
                AS BIGINT)
    FROM documents
    """,
    doc="Constraint-validation battery (Deequ/Great-Expectations shape): "
        "primary-key duplicate count, referential-integrity anti-join "
        "(orders -> customer), value-range, and null-rate checks, each "
        "as one column-pruned aggregate; results union into a "
        "(check_name, n_violations) report — the gate a medallion "
        "promotion runs. All counts integer -> hash-exact oracle. At "
        "100 TB each check is a map-side-partial scan and the FK check "
        "is the same anti-join shape as the snapshot diff (runtime "
        "Bloom filter applies).",
)
def q_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    o = cat.table("orders")
    c = cat.table("customer")
    li = cat.table("lineitem")
    e = cat.table("events")
    d = cat.table("documents")

    def row(name: str, agg: DataFrame) -> DataFrame:
        return agg.select(F.lit(name).alias("check_name"),
                          F.coalesce(F.col("n"), F.lit(0))
                          .cast("long").alias("n_violations"))

    pk = (o.groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
          .where(F.col("cnt") > 1)
          .agg(F.sum(F.col("cnt") - 1).alias("n")))
    fk = (o.join(c, o.o_custkey == c.c_custkey, "left_anti")
          .agg(F.count(F.lit(1)).alias("n")))
    rng = li.agg(F.count(F.when((F.col("l_quantity") < 1)
                                | (F.col("l_quantity") > 50), 1)).alias("n"))
    cn = c.agg(F.count(F.when(F.col("c_name").isNull(), 1)).alias("n"))
    ts = e.agg(F.count(F.when(F.col("ts").isNull(), 1)).alias("n"))
    tx = d.agg(F.count(F.when(F.col("text").isNull()
                              | (F.length("text") == 0), 1)).alias("n"))
    return (row("orders_pk_duplicates", pk)
            .unionByName(row("orders_fk_customer_missing", fk))
            .unionByName(row("lineitem_qty_out_of_range", rng))
            .unionByName(row("customer_name_null", cn))
            .unionByName(row("events_ts_null", ts))
            .unionByName(row("documents_text_empty", tx)))


K_ANON = 5  # minimum acceptable quasi-identifier group size


@register(
    "q_k_anonymity",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT COUNT(*) AS n_groups,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           CAST(COUNT(CASE WHEN n < {K_ANON} THEN 1 END) AS BIGINT)
               AS n_risky_groups,
           CAST(COALESCE(SUM(CASE WHEN n < {K_ANON} THEN n END), 0)
                AS BIGINT) AS n_risky_rows,
           (MIN(n) >= {K_ANON}) AS k_anonymous
    FROM g
    """,
    doc=f"k-anonymity audit (k={K_ANON}) over the quasi-identifier pair "
        "(nation, market segment): group sizes below k mean those rows "
        "are re-identifiable by the QI combination alone — the privacy "
        "gate a data release runs beside the PII regex scan "
        "(q_pii_redaction) and the release manifest "
        "(q_corpus_release). One grouped count plus a 1-row summary "
        "aggregate; generalization/suppression decisions read straight "
        "off n_risky_groups. All integers — hash-exact.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count(F.lit(1)).alias("n")))
    risky = F.when(F.col("n") < K_ANON, F.col("n"))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("n").cast("long").alias("min_group_size"),
        F.count(risky).cast("long").alias("n_risky_groups"),
        F.coalesce(F.sum(risky), F.lit(0)).cast("long").alias("n_risky_rows"),
        (F.min("n") >= K_ANON).alias("k_anonymous"))


@register(
    "q_benford_audit",
    oracle="""
    WITH d AS (
        SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                   AS VARCHAR), 1, 1) AS INT) AS digit
        FROM orders WHERE o_totalprice >= 1),
    ct AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM ct)
    SELECT digit, n,
           ROUND(n / tot.total::DOUBLE, 4) + 0.0 AS share,
           ROUND(log10(1.0 + 1.0 / digit), 4) + 0.0 AS benford,
           ROUND(ABS(n / tot.total::DOUBLE
                     - log10(1.0 + 1.0 / digit)), 4) + 0.0 AS abs_dev
    FROM ct CROSS JOIN tot
    """,
    doc="Benford first-digit audit of order totals: observed "
        "first-significant-digit shares vs the Benford expectation "
        "log10(1+1/d) with per-digit absolute deviation — the classic "
        "fabricated-data / fraud screen beside the k-anonymity and "
        "data-quality audits. First digit is extracted through integer "
        "string-prefix (FLOOR then BIGINT then first char), never "
        "through log10-of-value, so no float-boundary can disagree "
        "between engines. One scan -> 9-row digit histogram; the total "
        "is re-aggregated from the histogram and broadcast back.",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    d = (o.where(F.col("o_totalprice") >= 1)
         .select(F.substring(F.floor("o_totalprice").cast("long")
                             .cast("string"), 1, 1).cast("int")
                 .alias("digit")))
    ct = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = ct.agg(F.sum("n").cast("long").alias("total"))
    share = F.col("n") / F.col("total").cast("double")
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (ct.crossJoin(F.broadcast(tot))
            .select("digit", "n",
                    (F.round(share, 4) + F.lit(0.0)).alias("share"),
                    (F.round(benford, 4) + F.lit(0.0)).alias("benford"),
                    (F.round(F.abs(share - benford), 4)
                     + F.lit(0.0)).alias("abs_dev")))


@register(
    "q_table_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           COUNT(*) - COUNT(o_orderkey) AS n_null,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           printf('%d', MIN(o_orderkey)) AS min_s,
           printf('%d', MAX(o_orderkey)) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           printf('%d', MIN(o_custkey)), printf('%d', MAX(o_custkey))
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           printf('%.2f', MIN(o_totalprice)), printf('%.2f', MAX(o_totalprice))
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d'),
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
           COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
    doc="Column-profile statistics (the DESCRIBE/ANALYZE operator a "
        "catalog maintains, and the input to CBO statistics): per "
        "column, null count, distinct count, and min/max — typed "
        "values rendered through explicit printf/date formats so the "
        "long-form table is cross-engine exact. Spark plan: ONE scan "
        "computes every per-column aggregate as a single 1-row "
        "aggregate (Catalyst fuses them; no per-column passes), then "
        "the row pivots to long form via an in-memory union of 5 "
        "1-row projections — zero extra shuffles, profile cost is one "
        "corpus pass regardless of column count. At 100 TB these are "
        "the stats that drive join reordering and partition sizing.",
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")

    def stats(col: str, mn, mx):
        return [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__null"),
            F.countDistinct(col).alias(f"{col}__distinct"),
            mn.alias(f"{col}__min"), mx.alias(f"{col}__max"),
        ]

    fmt_d = lambda c, agg: F.format_string("%d", agg(c))          # noqa: E731
    fmt_f = lambda c, agg: F.format_string("%.2f", agg(c))        # noqa: E731
    fmt_t = lambda c, agg: F.date_format(agg(c), "yyyy-MM-dd")    # noqa: E731

    one = o.agg(*(
        stats("o_orderkey", fmt_d("o_orderkey", F.min), fmt_d("o_orderkey", F.max))
        + stats("o_custkey", fmt_d("o_custkey", F.min), fmt_d("o_custkey", F.max))
        + stats("o_totalprice", fmt_f("o_totalprice", F.min), fmt_f("o_totalprice", F.max))
        + stats("o_orderdate", fmt_t("o_orderdate", F.min), fmt_t("o_orderdate", F.max))
        + stats("o_orderpriority", F.min("o_orderpriority"), F.max("o_orderpriority"))
    ))
    rows = [
        F.struct(F.lit(c).alias("col_name"),
                 F.col(f"{c}__null").alias("n_null"),
                 F.col(f"{c}__distinct").alias("n_distinct"),
                 F.col(f"{c}__min").alias("min_s"),
                 F.col(f"{c}__max").alias("max_s"))
        for c in ("o_orderkey", "o_custkey", "o_totalprice",
                  "o_orderdate", "o_orderpriority")
    ]
    return (one.select(F.explode(F.array(*rows)).alias("p"))
            .select("p.col_name", "p.n_null", "p.n_distinct",
                    "p.min_s", "p.max_s"))


# Declared column contracts for the non-temporal columns of the core
# tables (temporal columns are excluded on purpose: their parquet
# physical type varies by fixture generator version and the Catalog
# normalizes them — see catalog.py _NANOS_TS_COLS).
SCHEMA_CONTRACT = {
    "orders": (("o_orderkey", "bigint"), ("o_custkey", "bigint"),
               ("o_orderstatus", "string"), ("o_totalprice", "double"),
               ("o_orderpriority", "string")),
    "documents": (("doc_id", "bigint"), ("text", "string"),
                  ("lang", "string"), ("source", "string"),
                  ("n_chars", "bigint")),
    "embeddings": (("vec_id", "bigint"), ("embedding", "array<float>"),
                   ("label", "int")),
}


def _contract_oracle() -> str:
    rows = []
    for tbl, cols in SCHEMA_CONTRACT.items():
        for name, typ in cols:
            rows.append(f"SELECT '{tbl}' AS table_name, '{name}' AS col_name,"
                        f" '{typ}' AS expected_type, '{typ}' AS actual_type,"
                        f" 'ok' AS status")
    return "\n    UNION ALL ".join(rows)


@register(
    "q_schema_contract_audit",
    oracle=_contract_oracle(),
    doc="Schema-contract validation (schema-on-write enforcement made "
        "checkable): every declared (table, column, type) of the core "
        "tables' stable columns compared against the LIVE schema the "
        "Catalog resolves — missing columns and type drift surface as "
        "non-'ok' rows (the oracle states the contract as literals, so "
        "any drift is a value mismatch the gate flags). Temporal "
        "columns are deliberately excluded: their parquet physical "
        "type varies by writer and the Catalog normalizes them. "
        "METADATA-ONLY: the engine side reads parquet footers (schema "
        "resolution), never a data row — the shape of a catalog "
        "crawler at 100 TB.",
)
def q_schema_contract_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rows = []
    for tbl, cols in SCHEMA_CONTRACT.items():
        live = dict(cat.table(tbl).dtypes)
        for name, typ in cols:
            actual = live.get(name, "missing")
            status = "ok" if actual == typ else "drift"
            rows.append((tbl, name, typ, actual, status))
    return local_df(spark, 
        rows, "table_name string, col_name string, expected_type string, "
              "actual_type string, status string")


L_DIV = 2  # required distinct sensitive values per QI group


@register(
    "q_l_diversity",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment,
               COUNT(*) AS n,
               COUNT(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                                   WHEN c_acctbal < 5000 THEN 'mid'
                                   ELSE 'high' END) AS l
        FROM customer GROUP BY c_nationkey, c_mktsegment)
    SELECT COUNT(*) AS n_groups,
           CAST(MIN(l) AS BIGINT) AS min_diversity,
           CAST(COUNT(CASE WHEN l < {L_DIV} THEN 1 END) AS BIGINT)
               AS n_homogeneous_groups,
           CAST(COALESCE(SUM(CASE WHEN l < {L_DIV} THEN n END), 0)
                AS BIGINT) AS n_exposed_rows,
           (MIN(l) >= {L_DIV}) AS l_diverse
    FROM g
    """,
    doc=f"l-diversity audit (l={L_DIV}) — the homogeneity-attack "
        "complement of q_k_anonymity: a QI group can be large enough "
        "for k-anonymity yet expose its members anyway if everyone in "
        "it shares the same SENSITIVE value (here: account-balance "
        "band). Per (nation, segment) group, the distinct sensitive "
        "bands are counted; groups below l are homogeneous and their "
        "rows exposed. Same one-groupBy + 1-row-summary shape as the "
        "k audit, all integers — hash-exact.",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    band = (F.when(F.col("c_acctbal") < 0, "neg")
            .when(F.col("c_acctbal") < 5000, "mid")
            .otherwise("high"))
    g = (c.groupBy("c_nationkey", "c_mktsegment")
         .agg(F.count(F.lit(1)).alias("n"),
              F.countDistinct(band).alias("l")))
    homog = F.when(F.col("l") < L_DIV, F.col("n"))
    return g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("l").cast("long").alias("min_diversity"),
        F.count(F.when(F.col("l") < L_DIV, 1)).cast("long")
        .alias("n_homogeneous_groups"),
        F.coalesce(F.sum(homog), F.lit(0)).cast("long")
        .alias("n_exposed_rows"),
        (F.min("l") >= L_DIV).alias("l_diverse"))


@register(
    "q_dp_noisy_counts",
    oracle="""
    WITH c AS (
        SELECT event_type, COUNT(*) AS n_exact
        FROM events GROUP BY event_type),
    n AS (
        SELECT event_type, n_exact,
               ('0x' || substr(md5(event_type || ':dp:7'), 1, 8))::BIGINT
                   / 4294967296.0 AS u
        FROM c)
    SELECT event_type, n_exact,
           ROUND(n_exact + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                 * LN(GREATEST(1.0 - 2.0 * ABS(u - 0.5), 1e-300)), 4)
               + 0.0 AS n_noisy
    FROM n
    """,
    doc="Differentially-private released counts (event-level adjacency, "
        "epsilon=1, sensitivity 1): Laplace(1/eps) noise via the "
        "inverse-CDF transform X = -b*sgn(U-.5)*ln(1-2|U-.5|) over a "
        "uniform U derived from the engine-portable md5-substring hash "
        "of the group key — so BOTH engines synthesize bit-identical "
        "noise and the released value itself is value-checked (seeded "
        "noise is also what makes a DP release auditable/reproducible "
        "in practice). Noise is added ONCE per group after full "
        "aggregation — the correct DP composition (noising partials "
        "then merging would sum d noise draws) — so the plan is the "
        "plain distributed count plus a map-only post-step; at 100 TB "
        "the DP layer costs nothing beyond the aggregate it protects. "
        "Production would swap the md5-seed for a secret key drawn "
        "per release (same plan), and event-level for user-level "
        "adjacency via per-user contribution clipping (a groupBy "
        "ahead of the count).",
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = Catalog(spark, sf_dir).table("events")
    c = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    u = (F.conv(F.substring(
        F.md5(F.concat(F.col("event_type"), F.lit(":dp:7"))), 1, 8),
        16, 10).cast("long") / F.lit(4294967296.0))
    noise = (F.when(u < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
             * F.log(F.greatest(F.lit(1.0) - 2.0 * F.abs(u - 0.5),
                                F.lit(1e-300))))
    return c.select(
        "event_type", "n_exact",
        (F.round(F.col("n_exact") + noise, 4) + F.lit(0.0)).alias("n_noisy"))


@register(
    "q_pseudonymize_join_integrity",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Deterministic pseudonymization with referential integrity: "
        "the customer key is replaced by a keyed-hash token "
        "(md5(key || secret salt), 16 hex chars) INDEPENDENTLY in the "
        "fact and dimension tables — the GDPR-style de-identification "
        "that lets analysts join on tokens without seeing raw ids — "
        "and the per-nation rollup then runs entirely over tokens. "
        "The oracle computes the same rollup over the RAW join, so a "
        "pass proves the tokenization is consistent across tables "
        "(same input -> same token), collision-free at this scale "
        "(n_customers counts distinct TOKENS on the engine side, "
        "distinct raw keys in the oracle), and lossless for "
        "analytics. Map-only token derivation (no extra shuffle "
        "beyond the join's own), and the token space (64 bits) keeps "
        "the birthday bound negligible at 100 TB key cardinalities; "
        "production swaps the literal salt for a vault-held secret "
        "(plan unchanged).",
)
def q_pseudonymize_join_integrity(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)

    def token(col):
        return F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(":vault-salt:29"))),
            1, 16)

    c = cat.table("customer").select(
        token(F.col("c_custkey")).alias("c_tok"), "c_nationkey")
    o = cat.table("orders").select(
        token(F.col("o_custkey")).alias("o_tok"), "o_totalprice")
    n = cat.table("nation")
    return (o.join(c, o.o_tok == c.c_tok)
            .join(F.broadcast(n),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"),
                 F.countDistinct("o_tok").alias("n_customers")))


T_CLOSE = 0.2  # max earth-mover's distance from the global distribution


@register(
    "q_privacy_t_closeness",
    oracle=f"""
    WITH rows_ AS (
        SELECT c_nationkey, c_mktsegment,
               LEAST(9, GREATEST(0,
                   CAST(FLOOR((c_acctbal + 1000.0) / 1100.0) AS INT)))
                   AS bucket
        FROM customer),
    buckets AS (SELECT unnest(range(0, 10)) AS bucket),
    gdist AS (
        SELECT b.bucket, COUNT(r.bucket) AS n
        FROM buckets b LEFT JOIN rows_ r USING (bucket) GROUP BY b.bucket),
    gdist_cum AS (
        SELECT g.bucket,
               SUM(g2.n) AS cum,
               (SELECT SUM(n) FROM gdist) AS total
        FROM gdist g JOIN gdist g2 ON g2.bucket <= g.bucket
        GROUP BY g.bucket),
    grp AS (
        SELECT c_nationkey, c_mktsegment, COUNT(*) AS ng
        FROM rows_ GROUP BY 1, 2),
    grp_b AS (
        SELECT g.c_nationkey, g.c_mktsegment, g.ng, b.bucket,
               (SELECT COUNT(*) FROM rows_ r
                WHERE r.c_nationkey = g.c_nationkey
                  AND r.c_mktsegment = g.c_mktsegment
                  AND r.bucket = b.bucket) AS n
        FROM grp g CROSS JOIN buckets b),
    grp_cum AS (
        SELECT gb.c_nationkey, gb.c_mktsegment, gb.ng, gb.bucket,
               SUM(gb2.n) AS cum
        FROM grp_b gb JOIN grp_b gb2
          ON gb2.c_nationkey = gb.c_nationkey
         AND gb2.c_mktsegment = gb.c_mktsegment
         AND gb2.bucket <= gb.bucket
        GROUP BY 1, 2, 3, 4),
    emd AS (
        SELECT gc.c_nationkey, gc.c_mktsegment, MAX(gc.ng) AS n,
               ROUND(SUM(ABS(gc.cum::DOUBLE / gc.ng
                             - gl.cum::DOUBLE / gl.total)) / 9.0, 6)
                   AS emd
        FROM grp_cum gc JOIN gdist_cum gl USING (bucket)
        WHERE gc.bucket < 9
        GROUP BY 1, 2)
    SELECT c_nationkey, c_mktsegment, CAST(n AS BIGINT) AS n, emd,
           (emd <= {T_CLOSE}) AS t_close
    FROM emd
    ORDER BY emd DESC, c_nationkey, c_mktsegment
    LIMIT 25
    """,
    doc=f"t-closeness audit (t={T_CLOSE}) completing the privacy triad "
        "beside q_k_anonymity and q_l_diversity: per quasi-identifier "
        "group (nation, market segment), the earth-mover's distance "
        "between the group's account-balance decile distribution and "
        "the global one — ordered-categorical EMD = mean |cumulative "
        "difference|. Buckets are INTEGER-exact fixed ranges (no "
        "ntile/global window); cumulative sums are bucket-triangle "
        "self-joins over the 10-row bucket spine, so every per-group "
        "number is a single integer/integer division — identical IEEE "
        "doubles on both engines, rounded at 6 dp. At 100 TB: one "
        "groupBy(QI, bucket) shuffle, then all spine joins broadcast; "
        "top-25 riskiest groups via TakeOrderedAndProject with a full "
        "deterministic tie-break.",
)
def q_privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir).table("customer")
    rows = c.select(
        "c_nationkey", "c_mktsegment",
        F.least(F.lit(9), F.greatest(F.lit(0), F.floor(
            (F.col("c_acctbal") + 1000.0) / 1100.0).cast("int")))
        .alias("bucket"))
    buckets = spark.range(10).select(F.col("id").cast("int").alias("bucket"))
    glob = (buckets.join(rows.groupBy("bucket")
                         .agg(F.count(F.lit(1)).alias("n")),
                         "bucket", "left")
            .select("bucket", F.coalesce("n", F.lit(0)).alias("n")))
    g2 = glob.select(F.col("bucket").alias("b2"), F.col("n").alias("n2"))
    glob_cum = (glob.join(F.broadcast(g2), F.col("b2") <= F.col("bucket"))
                .groupBy("bucket").agg(F.sum("n2").alias("cum")))
    total = glob.agg(F.sum("n").alias("total"))
    glob_cum = glob_cum.crossJoin(F.broadcast(total))
    grp = (rows.groupBy("c_nationkey", "c_mktsegment")
           .agg(F.count(F.lit(1)).alias("ng")))
    gb_counts = (rows.groupBy("c_nationkey", "c_mktsegment", "bucket")
                 .agg(F.count(F.lit(1)).alias("n")))
    grp_b = (grp.crossJoin(F.broadcast(buckets))
             .join(gb_counts, ["c_nationkey", "c_mktsegment", "bucket"],
                   "left")
             .select("c_nationkey", "c_mktsegment", "ng", "bucket",
                     F.coalesce("n", F.lit(0)).alias("n")))
    gb2 = grp_b.select("c_nationkey", "c_mktsegment",
                       F.col("bucket").alias("b2"), F.col("n").alias("n2"))
    grp_cum = (grp_b.join(gb2, ["c_nationkey", "c_mktsegment"])
               .where(F.col("b2") <= F.col("bucket"))
               .groupBy("c_nationkey", "c_mktsegment", "ng", "bucket")
               .agg(F.sum("n2").alias("cum")))
    emd = (grp_cum.where(F.col("bucket") < 9)
           .join(F.broadcast(glob_cum.withColumnRenamed("cum", "gcum")),
                 "bucket")
           .groupBy("c_nationkey", "c_mktsegment")
           .agg(F.max("ng").cast("long").alias("n"),
                F.round(F.sum(F.abs(
                    F.col("cum").cast("double") / F.col("ng")
                    - F.col("gcum").cast("double") / F.col("total")))
                    / 9.0, 6).alias("emd")))
    return (emd.select("c_nationkey", "c_mktsegment", "n", "emd",
                       (F.col("emd") <= T_CLOSE).alias("t_close"))
            .orderBy(F.desc("emd"), "c_nationkey", "c_mktsegment")
            .limit(25))


# --------------------------------------------------------------------------
# Bloom-filter join pruning — the runtime-filter audit
# --------------------------------------------------------------------------

@register(
    "q_join_bloom_prune",
    oracle="""
    WITH hp(j, a, b) AS (VALUES (0, 1103515245, 12345),
                                (1, 69069, 362437),
                                (2, 1664525, 1013904223)),
    dim AS (SELECT DISTINCT s_suppkey AS k FROM supplier
            WHERE s_nationkey < 5),
    bits AS (SELECT DISTINCT hp.j,
                    ((hp.a * dim.k + hp.b) % 2147483647) % 128 AS h
             FROM dim CROSS JOIN hp),
    fk AS (SELECT l_suppkey AS k, COUNT(*) AS nrows
           FROM lineitem GROUP BY l_suppkey),
    cand AS (
        SELECT fk.k, fk.nrows
        FROM fk CROSS JOIN hp
        JOIN bits ON bits.j = hp.j
                 AND bits.h = ((hp.a * fk.k + hp.b) % 2147483647) % 128
        GROUP BY fk.k, fk.nrows
        HAVING COUNT(*) = 3),
    ex AS (SELECT fk.k, fk.nrows FROM fk JOIN dim ON fk.k = dim.k)
    SELECT (SELECT COUNT(*) FROM dim)::BIGINT AS n_dim_keys,
           (SELECT COUNT(*) FROM ex)::BIGINT AS n_exact_keys,
           (SELECT COUNT(*) FROM cand)::BIGINT AS n_bloom_keys,
           ((SELECT COUNT(*) FROM cand)
            - (SELECT COUNT(*) FROM ex))::BIGINT AS n_false_positive_keys,
           (SELECT COALESCE(SUM(nrows), 0) FROM ex)::BIGINT AS n_exact_rows,
           (SELECT COALESCE(SUM(nrows), 0) FROM cand)::BIGINT AS n_bloom_rows,
           (SELECT COUNT(*) FROM ex
            WHERE k NOT IN (SELECT k FROM cand)) = 0 AS zero_false_negatives
    """,
    doc="Bloom-filter join pruning audit — the runtime-filter pattern "
        "(Spark's own InjectRuntimeFilter / Iceberg Bloom pushdown) made "
        "explicit and value-checked. A 3-hash x 128-bit Bloom filter is "
        "built from the dim-side join keys (suppliers in nations 0-4) as "
        "a ~45-row (hash_fn, bit) table, broadcast, and applied to the "
        "fact side BEFORE the join: a fact key survives iff all 3 of its "
        "hash bits are set. The audit proves the two properties that make "
        "the technique sound at 100 TB: ZERO false negatives (every truly "
        "matching key survives — Bloom filters only over-approximate) and "
        "a measured false-positive key count (the wasted-shuffle cost of "
        "m=128 at this fill factor). At scale the filter replaces "
        "shuffling the full fact table into a join: rows are dropped at "
        "the scan with a broadcast bitset, and only FP keys pay the "
        "shuffle. Hashes are integer LCGs mod a prime mod m — bit-exact "
        "on both engines, no float anywhere.",
)
def q_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = Catalog(spark, sf_dir)
    P, M = 2147483647, 128
    hp = local_df(spark, 
        [(0, 1103515245, 12345), (1, 69069, 362437), (2, 1664525, 1013904223)],
        "j int, a long, b long")
    dim = (c.table("supplier").where(F.col("s_nationkey") < 5)
           .select(F.col("s_suppkey").alias("k")).distinct())
    hb = ((F.col("a") * F.col("k") + F.col("b")) % P) % M
    bits = (dim.crossJoin(F.broadcast(hp))
            .select("j", hb.alias("h")).distinct())
    fk = (c.table("lineitem").groupBy(F.col("l_suppkey").alias("k"))
          .agg(F.count(F.lit(1)).alias("nrows")))
    cand = (fk.crossJoin(F.broadcast(hp))
            .withColumn("h", hb)
            .join(F.broadcast(bits), ["j", "h"])
            .groupBy("k", "nrows").agg(F.count(F.lit(1)).alias("nh"))
            .where(F.col("nh") == 3).select("k", "nrows"))
    ex = fk.join(F.broadcast(dim), "k")
    missed = ex.join(cand, "k", "left_anti")
    agg = lambda df, cn, rn: df.agg(
        F.count(F.lit(1)).cast("long").alias(cn),
        F.coalesce(F.sum("nrows"), F.lit(0)).cast("long").alias(rn))
    return (dim.agg(F.count(F.lit(1)).cast("long").alias("n_dim_keys"))
            .crossJoin(F.broadcast(agg(ex, "n_exact_keys", "n_exact_rows")))
            .crossJoin(F.broadcast(agg(cand, "n_bloom_keys", "n_bloom_rows")))
            .crossJoin(F.broadcast(
                missed.agg(F.count(F.lit(1)).alias("n_missed"))))
            .select("n_dim_keys", "n_exact_keys", "n_bloom_keys",
                    (F.col("n_bloom_keys") - F.col("n_exact_keys"))
                    .alias("n_false_positive_keys"),
                    "n_exact_rows", "n_bloom_rows",
                    (F.col("n_missed") == 0).alias("zero_false_negatives")))


# --------------------------------------------------------------------------
# Randomized response — local differential privacy, debiased and audited
# --------------------------------------------------------------------------

@register(
    "q_privacy_randomized_response",
    oracle="""
    WITH base AS (
        SELECT o_orderkey,
               o_orderpriority = '1-URGENT' AS s,
               (1103515245 * o_orderkey + 12345) % 2147483648
                   < 1610612736 AS truthful
        FROM orders),
    rep AS (
        SELECT s, CASE WHEN truthful THEN s ELSE NOT s END AS reported
        FROM base),
    agg AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN s THEN 1 ELSE 0 END) AS n_true,
               SUM(CASE WHEN reported THEN 1 ELSE 0 END) AS n_rep
        FROM rep)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n_true AS BIGINT) AS n_true_sensitive,
           CAST(n_rep AS BIGINT) AS n_reported_true,
           ROUND(CAST(n_true AS DOUBLE) / n, 6) AS true_rate,
           ROUND((CAST(n_rep AS DOUBLE) / n - 0.25) / 0.5, 6)
               AS estimated_rate,
           ROUND(ABS((CAST(n_rep AS DOUBLE) / n - 0.25) / 0.5
                     - CAST(n_true AS DOUBLE) / n), 6) AS abs_error,
           ROUND(LN(3.0), 6) AS epsilon_ldp
    FROM agg
    """,
    doc="Warner randomized response — the local-differential-privacy "
        "mechanism (each row lies with probability 1-p before anything "
        "is collected) plus the debiased population estimator "
        "pi_hat = (observed_rate + p - 1)/(2p - 1), audited against "
        "the true sensitive rate it is never allowed to see row-wise. "
        "p = 3/4 gives epsilon = ln(p/(1-p)) = ln 3 per-row LDP. The "
        "truth coin is the registry's deterministic cross-engine "
        "randomness: 31-bit LCG per o_orderkey compared against the "
        "EXACT integer threshold floor(0.75 * 2^31) = 1610612736 — no "
        "float sampling, so both engines flip identical coins and "
        "every count is hash-exact. Scale shape: one scan, one "
        "aggregate; the mechanism is embarrassingly parallel (per-row "
        "perturbation) and the estimator needs only two counters — "
        "this is why RR-style collection works at telemetry scale "
        "(RAPPOR et al.) where central DP aggregation cannot.",
)
def q_privacy_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = Catalog(spark, sf_dir).table("orders")
    s = (F.col("o_orderpriority") == "1-URGENT")
    truthful = ((F.lit(1103515245) * F.col("o_orderkey") + 12345)
                % F.lit(2147483648) < 1610612736)
    rep = o.select(s.alias("s"),
                   F.when(truthful, s).otherwise(~s).alias("reported"))
    agg = rep.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("s"), 1).otherwise(0)).alias("n_true"),
        F.sum(F.when(F.col("reported"), 1).otherwise(0)).alias("n_rep"))
    n = F.col("n").cast("double")
    true_rate = F.col("n_true").cast("double") / n
    est = (F.col("n_rep").cast("double") / n - 0.25) / 0.5
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("n_true").cast("long").alias("n_true_sensitive"),
        F.col("n_rep").cast("long").alias("n_reported_true"),
        F.round(true_rate, 6).alias("true_rate"),
        F.round(est, 6).alias("estimated_rate"),
        F.round(F.abs(est - true_rate), 6).alias("abs_error"),
        F.round(F.log(F.lit(3.0)), 6).alias("epsilon_ldp"))


@register(
    "q_observe_scan_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
               AS n_nonpositive_price,
           CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
               AS n_null_custkey,
           ROUND(SUM(o_totalprice), 2) AS total_price,
           ROUND(MAX(o_totalprice), 2) AS max_price
    FROM orders
    """,
    doc="Side-channel scan metrics via pyspark.sql.Observation "
        "(df.observe): data-quality counters — row count, constraint "
        "violations, null counts, a control total, a distinct count — "
        "collected DURING the pass that materializes the data, not by "
        "a second scan. This is the Deequ-style 'metrics repository' "
        "pattern at 100 TB: the promotion job already reads every row "
        "once, so quality counters must ride that scan for free; "
        "observe() attaches AggregateExpressions to the plan and the "
        "listener hands back one metrics row after the action, zero "
        "extra jobs. The query materializes the observed row as its "
        "result so the driver's oracle can value-check the metrics "
        "themselves. (DISTINCT aggregates are rejected inside "
        "observe() even in batch — INVALID_OBSERVED_METRICS — so the "
        "cardinality-style metric here is a MAX control value; "
        "approx_count_distinct is the observe-compatible distinct.)",
)
def q_observe_scan_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    o = Catalog(spark, sf_dir).table("orders")
    obs = Observation("scan_metrics")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1))
         .alias("n_nonpositive_price"),
        F.count(F.when(F.col("o_custkey").isNull(), 1))
         .alias("n_null_custkey"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"))
    # the action that drives the scan; metrics land on the Observation
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return local_df(spark, 
        [(m["n_rows"], m["n_nonpositive_price"], m["n_null_custkey"],
          float(m["total_price"]), float(m["max_price"]))],
        "n_rows long, n_nonpositive_price long, n_null_custkey long, "
        "total_price double, max_price double")
