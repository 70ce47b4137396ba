"""Text expression library: known-value checks for tokenizer, shingles,
language-ID, fingerprint (all pure JVM expressions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_project_spark.functions import text as T


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(col.alias("v")).first()["v"]


def test_tokens(spark):
    assert _one(spark, "Hello, World! 42x", T.tokens("text")) == ["hello", "world", "42x"]
    assert _one(spark, "", T.tokens("text")) == []


def test_shingles(spark):
    toks = T.tokens("text")
    got = _one(spark, "a b c d", T.shingles(toks, n=3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", T.shingles(toks, n=3)) == []


def test_shingles_distinct(spark):
    got = _one(spark, "x y x y x y", T.shingles(T.tokens("text"), n=2))
    assert sorted(got) == ["x y", "y x"]


def test_lang_guess(spark):
    toks = T.tokens("text")
    assert _one(spark, "the cat is in the house and it is big", T.lang_guess(toks)) == "en"
    assert _one(spark, "el gato y la casa de los nenes", T.lang_guess(toks)) == "es"
    assert _one(spark, "zzz qqq www", T.lang_guess(toks)) == "unknown"


def test_fingerprint_known_value(spark):
    # "ab" -> ((0*31+97) % M)*31 + 98 = 3105
    got = _one(spark, "ab", T.fingerprint(T.tokens("text")))
    assert got == 97 * 31 + 98


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta", T.fingerprint(T.tokens("text")))
    b = _one(spark, "beta alpha", T.fingerprint(T.tokens("text")))
    assert a != b


def test_quality_bounds(spark):
    d = spark.createDataFrame(
        [("the quick brown fox and the lazy dog in a field of green",),
         ("!!!! ???? ####",), ("",)], "text string")
    vals = [r["q"] for r in d.select(
        T.quality_score(F.col("text"), T.tokens("text")).alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[1]  # prose beats punctuation soup


def test_bpe_pieces_contractions_and_runs(spark):
    got = _one(spark, "don't stop 123 now!!", T.bpe_pieces("text"))
    # don | 't | stop | 123 | now | !! -> 6 pre-tokenizer pieces
    assert got == 6


def test_subword_count_ceil(spark):
    # lengths 2, 4, 9 -> ceil/4 = 1 + 1 + 3
    got = _one(spark, "ab cdef governance", T.subword_count(T.tokens("text")))
    assert got == 5


def test_span_list_keeps_duplicates_in_order(spark):
    toks = T.tokens("text")
    got = _one(spark, "a b a b a", T.span_list(toks, 2))
    assert got == ["a b", "b a", "a b", "b a"]
    assert _one(spark, "a", T.span_list(toks, 2)) == []


def test_char_fold_hash_matches_fingerprint(spark):
    # char_fold_hash over the joined tokens == fingerprint by construction
    toks = T.tokens("text")
    a = _one(spark, "alpha beta", T.fingerprint(toks))
    b = _one(spark, "alpha beta", T.char_fold_hash(F.concat_ws(" ", toks)))
    assert a == b


def test_winnow_fingerprints_guarantee(spark):
    # Two docs sharing a run of >= k+w-1 tokens must share a fingerprint.
    k, w = 3, 2
    shared = "one two three four five six"
    d = spark.createDataFrame(
        [(1, "xx yy " + shared), (2, shared + " zz qq")], "id long, text string")
    rows = d.select(
        "id", T.winnow_fingerprints(T.tokens("text"), k=k, w=w).alias("fp")
    ).collect()
    fps = {r["id"]: set(r["fp"]) for r in rows}
    assert fps[1] & fps[2]
    # selection keeps a subset of span hashes
    n_spans = 6  # len(shared ...)=8 tokens -> 6 spans of 3
    assert all(0 < len(s) <= n_spans for s in fps.values())


def test_winnow_short_doc_empty(spark):
    got = _one(spark, "a b c", T.winnow_fingerprints(T.tokens("text"), k=3, w=2))
    assert got == []


def test_null_and_empty_text_defined_behavior(spark):
    """Fixture regenerations may introduce NULL or empty text; the core
    expressions must stay total: empty -> empty/zero outputs, NULL ->
    NULL (never a crash or a silently-wrong value)."""
    df = spark.createDataFrame([(1, ""), (2, None), (3, "one two")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in df.select(
        "doc_id",
        T.tokens("text").alias("toks"),
        T.token_count("text").alias("n"),
        T.shingles(T.tokens("text"), 2).alias("sh"),
        T.quality_score(F.col("text"), T.tokens("text")).alias("q"),
        T.winnow_fingerprints(T.tokens("text"), k=2, w=2).alias("fp"),
    ).collect()}
    assert got[1]["toks"] == [] and got[1]["n"] == 0 and got[1]["sh"] == []
    assert got[1]["q"] == 0.0 and got[1]["fp"] == []
    # NULL text propagates NULL (row drops out of explode-based plans)
    assert got[2]["toks"] is None and got[2]["sh"] is None
    assert got[2]["fp"] is None
    assert got[3]["n"] == 2 and got[3]["sh"] == ["one two"]


def test_redact_pii_replaces_all_three_kinds(spark):
    from datalake_project_spark.functions.text import (
        PII_EMAIL, PII_IPV4, PII_PHONE, pii_count, redact_pii,
    )
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-1.org, call +1 (555) 123-4567, host 10.0.255.7."),
         (2, "no pii here at all"),
         (3, "two mails x@y.io y@z.co and 192.168.0.1")],
        "id long, t string")
    got = {r["id"]: r for r in df.select(
        "id", redact_pii("t").alias("red"),
        pii_count("t", PII_EMAIL).alias("ne"),
        pii_count("t", PII_PHONE).alias("np"),
        pii_count("t", PII_IPV4).alias("ni")).collect()}
    assert got[1]["red"] == "mail [EMAIL], call [PHONE], host [IP]."
    assert (got[1]["ne"], got[1]["np"], got[1]["ni"]) == (1, 1, 1)
    assert got[2]["red"] == "no pii here at all"
    assert got[3]["red"] == "two mails [EMAIL] [EMAIL] and [IP]"
    assert got[3]["ne"] == 2 and got[3]["ni"] == 1


class TestMisraGries:
    """The sketch layer of q_text_heavy_hitters: the compaction path
    (which fixture-scale vocab never triggers) exercised with a tiny k
    on adversarial data, pinning the superset guarantee and end-to-end
    exactness."""

    def test_compaction_keeps_heavy_superset(self, spark):
        from datalake_project_spark.operators.sketches import mg_candidates

        # 1000 'hot' + 999 singletons in ONE partition, k=3 -> heavy
        # item must survive aggressive compaction
        rows = [("hot",)] * 1000 + [(f"u{i}",) for i in range(999)]
        df = spark.createDataFrame(rows, "w string").coalesce(1)
        cands = {r.w for r in mg_candidates(df, "w", k=3).collect()}
        assert len(cands) <= 3
        assert "hot" in cands

    def test_heavy_hitters_exact_after_recount(self, spark):
        from datalake_project_spark.operators.sketches import heavy_hitters

        # N=1200: phi_inv=10 -> threshold 120. a=600, b=400, c=150,
        # d=50: expect exactly a, b, c with exact counts, across 4
        # partitions with k barely above phi_inv.
        rows = ([("a",)] * 600 + [("b",)] * 400 + [("c",)] * 150
                + [(f"z{i}",) for i in range(50)])
        df = spark.createDataFrame(rows, "w string").repartition(4)
        out = {r.w: r.n_occurrences
               for r in heavy_hitters(df, "w", phi_inv=10, k=12).collect()}
        assert out == {"a": 600, "b": 400, "c": 150}

    def test_k_must_exceed_phi_inv(self, spark):
        import pytest as _pytest

        from datalake_project_spark.operators.sketches import heavy_hitters

        df = spark.createDataFrame([("x",)], "w string")
        with _pytest.raises(ValueError):
            heavy_hitters(df, "w", phi_inv=10, k=10)
