"""Vector math over ``array<float>`` embedding columns — JVM-side only.

Dot products / norms / cosine via ``F.zip_with`` + ``F.aggregate`` (higher-
order functions compiled by Catalyst), NOT Python UDFs: on 100 TB the
similarity hot loop must stay inside whole-stage codegen. Values are
widened to double before accumulation (index-order summation, so results
are reproducible and comparable across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _sum_arr(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return _sum_arr(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(_sum_arr(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_signature(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one sign bit per plane, packed into
    a long. Deterministic given ``planes`` (callers pass seeded planes).

    Pure-expression form — fine for a handful of planes. For the LSH hot
    path use :func:`hyperplane_signature_vectorized`: n_planes array-fold
    expressions make Catalyst codegen compile time the bottleneck long
    before data size does.
    """
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in p])
        bit = F.when(dot(a, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + (bit * F.lit(1 << i).cast("long"))
    return sig


def hyperplane_signature_vectorized(planes: list[list[float]]):
    """Arrow-vectorized hyperplane signature: one ``(batch x dim) @
    (dim x n_planes)`` BLAS matmul per Arrow batch, sign bits packed into
    a long. Identical output to :func:`hyperplane_signature`; ~constant
    cost per batch regardless of n_planes. Returns a pandas_udf ready to
    apply to an ``array<float>`` column."""
    import numpy as np
    import pandas as pd

    P = np.asarray(planes, dtype=np.float64)
    weights = (np.int64(1) << np.arange(P.shape[0], dtype=np.int64))

    def sig(vecs):
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        bits = (X @ P.T) >= 0
        return pd.Series(bits @ weights)

    # no type hints: module-wide `from __future__ import annotations`
    # stringifies them, which pandas_udf's hint resolver rejects
    return F.pandas_udf(sig, "long")
