"""UDAF/UDTF surface (SURVEY §2.8): the Arrow grouped-agg pandas UDF and
the Python UDTF must equal their built-in formulations."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_udaf_weighted_avg_matches_native(spark):
    li = (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
          .select("l_returnflag", "l_extendedprice", "l_quantity"))
    from datalake_project_spark.functions.udx import make_weighted_avg_udaf

    wavg = make_weighted_avg_udaf()
    got = {r[0]: r[1] for r in li.groupBy("l_returnflag")
           .agg(wavg(F.col("l_extendedprice"), F.col("l_quantity"))).collect()}
    exp = {r[0]: r[1] for r in li.groupBy("l_returnflag")
           .agg((F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                 / F.sum("l_quantity"))).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-6 * abs(exp[k])


def test_udtf_word_ngrams_matches_span_list(spark):
    from datalake_project_spark.functions.text import span_list, tokens
    from datalake_project_spark.functions.udx import word_ngrams

    spark.udtf.register("word_ngrams", word_ngrams)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(50))
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql("""
        SELECT d.doc_id, g.pos, g.ngram
        FROM udtf_docs d, LATERAL word_ngrams(lower(d.text), 3) g
    """)
    exp = docs.select(
        "doc_id",
        F.posexplode(span_list(tokens("text"), 3)).alias("pos", "ngram"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_udtf_edge_cases(spark):
    from datalake_project_spark.functions.udx import word_ngrams

    spark.udtf.register("word_ngrams2", word_ngrams)
    # short string -> no rows; NULL -> no rows; n=1 -> identity tokens
    assert spark.sql("SELECT * FROM word_ngrams2('a b', 3)").count() == 0
    assert spark.sql(
        "SELECT * FROM word_ngrams2(CAST(NULL AS STRING), 2)").count() == 0
    rows = spark.sql("SELECT * FROM word_ngrams2('x  y', 1)").collect()
    assert [(r.pos, r.ngram) for r in rows] == [(0, "x"), (1, "y")]
