"""Vector expression library vs numpy ground truth; LSH top-k recall vs
brute force on clustered vectors."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from datalake_project_spark.functions.vectors import cosine, dot, norm
from datalake_project_spark.operators.similarity import cosine_topk, cosine_topk_lsh


def test_dot_norm_cosine_vs_numpy(spark):
    rng = np.random.RandomState(7)
    a = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    df = spark.createDataFrame([(a.tolist(), b.tolist())],
                               "a array<float>, b array<float>")
    got = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("n"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).first()
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    assert got["d"] == pytest.approx(float(ad @ bd), rel=1e-12)
    assert got["n"] == pytest.approx(float(np.linalg.norm(ad)), rel=1e-12)
    assert got["c"] == pytest.approx(
        float(ad @ bd / (np.linalg.norm(ad) * np.linalg.norm(bd))), rel=1e-12)


def _clustered(spark, n_clusters=8, per_cluster=20, dim=64, seed=3, noise=0.15):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for ci in range(n_clusters):
        pts = centers[ci] + noise * rng.standard_normal((per_cluster, dim))
        vecs += [(ci * per_cluster + i, p.astype(np.float32).tolist())
                 for i, p in enumerate(pts)]
    return spark.createDataFrame(vecs, "vec_id long, embedding array<float>")


def test_lsh_topk_recall_vs_bruteforce(spark):
    # noise=0.04 => intra-cluster cosine ~0.9: the near-duplicate regime
    # hyperplane LSH is built for (16 planes / 4-bit bands => ~96% recall
    # per neighbor at 25 deg; diffuse clouds at cos~0.4 are NOT the
    # operator's contract and would need more probes).
    e = _clustered(spark, noise=0.04)
    q = e.where(F.col("vec_id") % 40 == 0)
    exact = cosine_topk(q, e, k=5).collect()
    approx = cosine_topk_lsh(q, e, k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in approx:
        total += 1
        hits += r["neighbor_id"] in exact_sets[r["query_id"]]
    # clustered fixture: same-cluster neighbors share hyperplane buckets
    assert total > 0 and hits / total >= 0.8


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF with 8 true clusters / 8 cells / 3 probes: a query's own cell
    plus two neighbors must hold nearly all true top-5 neighbors."""
    from datalake_project_spark.operators.similarity import cosine_topk_ivf

    e = _clustered(spark, noise=0.04)
    q = e.where(F.col("vec_id") % 40 == 0)
    exact = cosine_topk(q, e, k=5).collect()
    approx = cosine_topk_ivf(q, e, k=5, n_clusters=8, n_probe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in approx:
        total += 1
        hits += r["neighbor_id"] in exact_sets[r["query_id"]]
    assert total > 0 and hits / total >= 0.8


def test_bruteforce_topk_deterministic_rank(spark):
    e = _clustered(spark, n_clusters=2, per_cluster=10)
    q = e.where(F.col("vec_id") == 0)
    out = cosine_topk(q, e, k=3).collect()
    assert [r["rank"] for r in out] == [1, 2, 3]
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert not math.isnan(sims[0])


def test_block_pairwise_equals_bruteforce(spark):
    """Block-matmul exact pairs must equal the expression-join brute force,
    including pairs that straddle blocks in both id orders."""
    from datalake_project_spark.operators.dedup import embedding_near_dup_pairs
    from datalake_project_spark.operators.similarity import block_pairwise_cosine

    e = _clustered(spark, n_clusters=4, per_cluster=15, dim=16, seed=11)
    brute = {(r["a_id"], r["b_id"]) for r in
             embedding_near_dup_pairs(e, threshold=0.8).collect()}
    # tiny blocks force many off-diagonal block pairs
    blocked = {(r["a_id"], r["b_id"]) for r in
               block_pairwise_cosine(e, threshold=0.8, block_rows=7).collect()}
    assert blocked == brute and len(brute) > 0


def test_quantize_int8_roundtrip_error_bound(spark):
    """Dequantized values differ from the original by at most scale/2
    per element (round-to-nearest), and zero vectors survive."""
    from datalake_project_spark.operators.similarity import (
        dequantize, quantize_int8,
    )
    import math
    data = [(1, [1.0, -0.5, 0.25, 127.0]), (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [-3.5, 2.5, 0.001, -0.002])]
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    qz = quantize_int8(df)
    deq = {r["vec_id"]: r["embedding"]
           for r in dequantize(qz).collect()}
    scales = {r["vec_id"]: r["scale"] for r in qz.collect()}
    for vid, orig in data:
        for a, b in zip(orig, deq[vid]):
            assert math.isclose(a, b, abs_tol=scales[vid] / 2 + 1e-7), \
                (vid, a, b, scales[vid])
    assert deq[2] == [0.0, 0.0, 0.0, 0.0]
    for r in qz.collect():
        assert all(-127 <= q <= 127 for q in r["qvec"])


def test_arrow_topk_equals_bruteforce(spark):
    """The Arrow/BLAS lane must return the exact brute-force answer:
    same neighbors, same ranks, same 6-dp cosines (global top-k is a
    subset of every batch's local top-k — monotonicity)."""
    from datalake_project_spark.operators.similarity import cosine_topk_arrow

    e = _clustered(spark, n_clusters=4, per_cluster=25, dim=32, seed=11)
    q = e.where(F.col("vec_id") < 7)
    exact = sorted(map(tuple, cosine_topk(q, e, k=5).collect()))
    arrow = sorted(map(tuple, cosine_topk_arrow(q, e, k=5).collect()))
    assert len(exact) == 7 * 5
    assert [r[:3] for r in exact] == [r[:3] for r in arrow]
    for x, a in zip(exact, arrow):
        assert a[3] == pytest.approx(x[3], abs=2e-6)  # 6-dp round seam


def test_arrow_topk_batch_locality_invariance(spark):
    """Repartitioning the candidate side (different Arrow batch splits)
    must not change the result — batch-local top-k is a pure refinement."""
    from datalake_project_spark.operators.similarity import cosine_topk_arrow

    e = _clustered(spark, n_clusters=3, per_cluster=30, dim=16, seed=5)
    q = e.where(F.col("vec_id") < 5)
    one = sorted(map(tuple, cosine_topk_arrow(q, e.coalesce(1), k=4).collect()))
    many = sorted(map(tuple, cosine_topk_arrow(q, e.repartition(13), k=4).collect()))
    assert one == many


def test_arrow_topk_exclude_self_and_string_ids(spark):
    """exclude_self masks identity matches by ID (not by value), and the
    kernel preserves non-numeric id types end-to-end."""
    from datalake_project_spark.operators.similarity import cosine_topk_arrow

    vecs = [("a", [1.0, 0.0]), ("b", [1.0, 0.0]),  # exact dup of a
            ("c", [0.0, 1.0]), ("d", [0.7, 0.7])]
    e = spark.createDataFrame(vecs, "vec_id string, embedding array<float>")
    out = cosine_topk_arrow(e.where(F.col("vec_id") == "a"), e, k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in
           out.orderBy("rank").collect()]
    # self excluded; the exact dup 'b' wins rank 1 at cos 1.0
    assert got == [("b", 1), ("d", 2)]
    assert dict(out.dtypes)["neighbor_id"] == "string"


def test_arrow_knn_distance_round_before_rank(spark):
    """distance=True with round_dp ranks by the ROUNDED distance with id
    tie-break — two candidates whose distances differ only past 6 dp
    must resolve by id, the ulp-safe argmax contract TwoNN pins."""
    import numpy as np

    from datalake_project_spark.operators.similarity import _arrow_knn

    base = np.array([1.0, 0.0, 0.0])
    # two candidates at numerically near-identical angles: ids decide
    tilt = 1e-9
    vecs = [(0, base.tolist()),
            (5, [np.cos(0.3), np.sin(0.3), 0.0]),
            (3, [np.cos(0.3 + tilt), np.sin(0.3 + tilt), 0.0]),
            (9, [0.0, 1.0, 0.0])]
    e = spark.createDataFrame([(i, [float(x) for x in v]) for i, v in vecs],
                              "vec_id long, embedding array<float>")
    out = _arrow_knn(e.where(F.col("vec_id") == 0), e, k=2,
                     query_id="vec_id", cand_id="vec_id",
                     vec_col="embedding", exclude_self=True,
                     distance=True, round_dp=6)
    got = [(r["neighbor_id"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(3, 1), (5, 2)]  # equal rounded dist -> id asc


def test_arrow_topk_empty_probes_and_null_vectors(spark):
    """Empty probe set returns an empty, correctly-typed frame; null
    candidate embeddings are excluded instead of crashing the matmul
    (the codegen twin null-scores them past top-k)."""
    from datalake_project_spark.operators.similarity import cosine_topk_arrow

    e = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    none = cosine_topk_arrow(e.where("vec_id < 0"), e, k=2)
    assert none.count() == 0
    assert [f[0] for f in none.dtypes] == \
        ["query_id", "neighbor_id", "rank", "cos_sim"]
    out = cosine_topk_arrow(e.where("vec_id = 1"), e, k=3).collect()
    assert sorted(r["neighbor_id"] for r in out) == [3]  # null excluded


def test_arrow_knn_probe_cap_fails_fast(spark, monkeypatch):
    """An oversized probe side raises a clear ValueError instead of
    silently collecting an unbounded matrix to the driver (the
    _ARROW_KNN_MAX_PROBES contract). Patched cap keeps the fixture
    tiny; the limit(cap+1) guard means only cap+1 rows ever collect."""
    import pytest

    import datalake_project_spark.operators.similarity as sim

    e = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<float>")
    monkeypatch.setattr(sim, "_ARROW_KNN_MAX_PROBES", 4, raising=True)
    with pytest.raises(ValueError, match="probe side exceeds"):
        sim.cosine_topk_arrow(e, e, k=2)
    # at or under the cap the lane still works
    monkeypatch.setattr(sim, "_ARROW_KNN_MAX_PROBES", 8, raising=True)
    assert sim.cosine_topk_arrow(e, e, k=2).count() == 16
