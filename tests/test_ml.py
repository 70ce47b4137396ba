"""ML-primitive queries vs independent numpy/pure-Python ground truth:
k-means trajectory, covariance partials, BM25 ranking, classifier
scoring. The DuckDB oracle gate checks these against SQL; these tests
check them against a SECOND independent implementation and pin the
edge cases SQL comparison can't isolate (argmin tie-break, empty
clusters, absent query terms)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from datalake_project_spark.queries.ml import (
    CENT_DP, K_CLUSTERS, N_ITER, _assign, q_embed_covariance, q_embed_kmeans,
)
from datalake_project_spark.queries.retrieval import (
    B, K1, PROBE_TERMS, _bm25_scores,
)


def _write_embeddings(spark, tmp_path, X):
    data = [(i, [float(v) for v in x], int(i) % 3) for i, x in enumerate(X)]
    df = spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")
    return str(tmp_path)


def test_assign_tie_breaks_to_lower_cluster(spark):
    # vector at the exact midpoint of two centroids: equal distance,
    # the lower cluster id must win on any engine
    e = spark.createDataFrame(
        [(7, [0.5, 0.0])], "vec_id long, v array<double>")
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0]), (0, [0.0, 0.0])], "cluster int, cvec array<double>")
    got = _assign(e, cents).collect()
    assert len(got) == 1
    assert got[0]["cluster"] == 0
    assert got[0]["dist"] == pytest.approx(0.5)


def _numpy_lloyd(X, k, n_iter, dp):
    """Independent reimplementation of the query's exact trajectory."""
    X = X.astype(np.float64)
    cents = X[:k].copy()
    for _ in range(n_iter):
        d = np.linalg.norm(X[:, None, :] - cents[None, :, :], axis=2)
        assign = d.argmin(axis=1)  # argmin takes lowest index on ties
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = np.round(members.mean(axis=0), dp)
    d = np.linalg.norm(X[:, None, :] - cents[None, :, :], axis=2)
    assign = d.argmin(axis=1)
    dist = d[np.arange(len(X)), assign]
    return assign, dist


def test_kmeans_matches_numpy_trajectory(spark, tmp_path):
    rng = np.random.RandomState(11)
    X = rng.standard_normal((60, 8)).astype(np.float32)
    sf_dir = _write_embeddings(spark, tmp_path, X)
    got = {r["cluster"]: (r["n_vecs"], r["avg_dist"])
           for r in q_embed_kmeans(spark, sf_dir).collect()}
    assign, dist = _numpy_lloyd(X, K_CLUSTERS, N_ITER, CENT_DP)
    assert sum(n for n, _ in got.values()) == len(X)
    for c in range(K_CLUSTERS):
        n = int((assign == c).sum())
        if n == 0:
            assert c not in got
            continue
        assert got[c][0] == n
        assert got[c][1] == pytest.approx(
            round(float(dist[assign == c].mean()), 4), abs=1e-4)


def test_kmeans_empty_cluster_keeps_centroid(spark, tmp_path):
    # clusters 0/1 seed inside a far-away twin pair; every other point
    # sits near seeds 2/3 => after update 1, some seed clusters can empty
    # and the query must still return a valid partition of all rows
    X = np.array([[100.0, 100.0], [100.0, 100.1]]
                 + [[0.0, 0.0]] * 10 + [[1.0, 1.0]] * 10, dtype=np.float32)
    sf_dir = _write_embeddings(spark, tmp_path, X)
    got = q_embed_kmeans(spark, sf_dir).collect()
    assert sum(r["n_vecs"] for r in got) == len(X)
    assign, dist = _numpy_lloyd(X, K_CLUSTERS, N_ITER, CENT_DP)
    want = {c: int((assign == c).sum()) for c in range(K_CLUSTERS)
            if (assign == c).sum()}
    assert {r["cluster"]: r["n_vecs"] for r in got} == want


def test_covariance_matches_numpy(spark, tmp_path):
    rng = np.random.RandomState(5)
    X = rng.standard_normal((200, 6)).astype(np.float32)
    sf_dir = _write_embeddings(spark, tmp_path, X)
    got = {(r["i"], r["j"]): r["cov"]
           for r in q_embed_covariance(spark, sf_dir).collect()}
    C = np.cov(X.astype(np.float64), rowvar=False, bias=True)
    assert len(got) == 6 * 7 // 2
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(round(float(C[i, j]), 4), abs=2e-4)


def _write_documents(spark, tmp_path, texts):
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_bm25_ranking_and_absent_terms(spark, tmp_path):
    # doc 0: 'hash' x3; doc 1: 'hash' x1; doc 2: no probe term at all
    sf_dir = _write_documents(spark, tmp_path, [
        "hash hash hash pad pad", "hash pad pad pad pad",
        "pad pad pad pad pad"])
    got = {r["doc_id"]: r["score"]
           for r in _bm25_scores(spark, sf_dir).collect()}
    assert set(got) == {0, 1}          # term-free doc never scored
    assert got[0] > got[1] > 0         # higher tf, same length => higher

    # cross-check doc 1 against the closed-form BM25 formula
    n_docs, avgdl, tf, dl, df_t = 3, 5.0, 1, 5, 2
    idf = math.log((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
    want = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    assert got[1] == pytest.approx(round(want, 4), abs=1e-4)
    assert PROBE_TERMS[0] == "hash"


def test_quality_classifier_formula(spark, tmp_path):
    from datalake_project_spark.queries.ml import q_text_quality_classifier

    # 'hash' len 4 -> (4%7-3)*0.05 = 0.05 ; 'go' len 2 -> -0.05 ;
    # doc 0 mean logit = 0.05 (keep), doc 1 = -0.05 (drop),
    # doc 2 mixed = 0.0 (prob exactly 0.5, keep since logit >= 0)
    sf_dir = _write_documents(
        spark, tmp_path, ["hash hash", "go go", "hash go"])
    got = {r["doc_id"]: (r["prob"], r["keep"])
           for r in q_text_quality_classifier(spark, sf_dir).collect()}
    sig = lambda x: 1.0 / (1.0 + math.exp(-x))  # noqa: E731
    assert got[0] == (pytest.approx(round(sig(0.05), 4)), True)
    assert got[1] == (pytest.approx(round(sig(-0.05), 4)), False)
    assert got[2] == (pytest.approx(0.5), True)


def test_gram_partials_shape_invariance(spark):
    # partial rows per batch depend on d only, never on batch row count
    from datalake_project_spark.queries.ml import _gram_partials
    import pandas as pd

    X = np.arange(12, dtype=np.float64).reshape(4, 3)
    out = list(_gram_partials(iter([
        pd.DataFrame({"v": [x for x in X]}),
        pd.DataFrame({"v": []}),           # empty batch contributes nothing
    ])))
    assert len(out) == 1
    assert len(out[0]) == 3 * 4 // 2
    row = out[0].set_index(["i", "j"]).loc[(0, 2)]
    assert row["sxy"] == pytest.approx(float((X[:, 0] * X[:, 2]).sum()))
    assert row["n"] == 4


def test_pca_power_matches_numpy_eigenvector(spark, tmp_path):
    rng = np.random.RandomState(3)
    # anisotropic cloud => dominant eigenvalue well-separated, so 3
    # power iterations from e_0 land close to the true eigenvector
    base = rng.standard_normal((300, 6)) * np.array([3.0, 1, 1, 0.5, 0.5, 0.2])
    X = base.astype(np.float32)
    sf_dir = _write_embeddings(spark, tmp_path, X)
    from datalake_project_spark.queries.ml import q_embed_pca_power
    got = np.array([r["component"] for r in
                    q_embed_pca_power(spark, sf_dir)
                    .orderBy("dim").collect()])
    C = np.cov(X.astype(np.float64), rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    if top[np.abs(got).argmax()] * got[np.abs(got).argmax()] < 0:
        top = -top
    assert np.linalg.norm(got) == pytest.approx(1.0, abs=1e-3)
    # cos similarity with the true eigenvector: power iteration after 3
    # steps on a well-separated spectrum is within a few degrees
    assert abs(float(got @ top)) > 0.99


def test_temperature_mix_invariants(spark, tmp_path):
    from datalake_project_spark.queries.corpus import (
        MIX_ALPHA, q_corpus_temperature_mix,
    )
    # head source 10x the tail's tokens: alpha-smoothing must narrow the
    # ratio from 10x to ~10^alpha while weights still sum to 1
    sf_dir = _write_documents(
        spark, tmp_path, ["tok " * 100] + ["tok " * 10] * 1)
    # overwrite sources: doc 0 -> head, doc 1 -> tail
    df = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("source", F.when(F.col("doc_id") == 0, "head")
                    .otherwise("tail"))
    df.write.mode("overwrite").parquet(f"{tmp_path}/docs2/documents.parquet")
    got = {r["source"]: r for r in
           q_corpus_temperature_mix(spark, f"{tmp_path}/docs2").collect()}
    assert sum(r["share"] for r in got.values()) == pytest.approx(1.0, abs=1e-5)
    assert sum(r["sample_weight"] for r in got.values()) == pytest.approx(1.0, abs=1e-5)
    raw_ratio = got["head"]["share"] / got["tail"]["share"]
    smooth_ratio = got["head"]["sample_weight"] / got["tail"]["sample_weight"]
    assert smooth_ratio == pytest.approx(raw_ratio ** MIX_ALPHA, rel=1e-3)
    assert smooth_ratio < raw_ratio


def test_logreg_gd_matches_numpy_trajectory(spark, tmp_path):
    from datalake_project_spark.queries.ml import (
        LR_DIMS, LR_DP, LR_ITERS, LR_RATE, q_embed_logreg_train,
    )
    rng = np.random.RandomState(21)
    # separable-ish: class 0 shifted along dim 0
    X = rng.standard_normal((120, 6)).astype(np.float32)
    labels = (rng.rand(120) < 0.4).astype(int)          # 1 => class 0
    X[labels == 1, 0] += 2.0
    data = [(i, [float(v) for v in X[i]], 0 if labels[i] else 1 + i % 2)
            for i in range(len(X))]
    spark.createDataFrame(
        data, "vec_id long, embedding array<float>, label int") \
        .write.mode("overwrite").parquet(f"{tmp_path}/embeddings.parquet")

    got = q_embed_logreg_train(spark, str(tmp_path)).first()

    Xd = X[:, :LR_DIMS].astype(np.float64)
    y = labels.astype(np.float64)
    w = np.zeros(LR_DIMS)
    b = 0.0
    for _ in range(LR_ITERS):
        p = 1.0 / (1.0 + np.exp(-(Xd @ w + b)))
        b = round(b + LR_RATE * float(np.mean(y - p)), LR_DP)
        w = np.round(w + LR_RATE * (Xd.T @ (y - p)) / len(y), LR_DP)
    p = 1.0 / (1.0 + np.exp(-(Xd @ w + b)))
    acc = float(np.mean((p >= 0.5) == (y == 1.0)))

    assert got["bias"] == pytest.approx(round(b, 4), abs=1e-4)
    for i in range(LR_DIMS):
        assert got[f"w{i}"] == pytest.approx(round(w[i], 4), abs=1e-4)
    assert got["train_acc"] == pytest.approx(round(acc, 4), abs=1e-4)
    assert acc > 0.7     # the shifted dim is actually learnable
