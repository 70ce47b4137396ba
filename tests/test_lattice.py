"""The r12 vectorized segmentation-lattice kernel replaced the
driver-stepped join DP for the whole unigram-LM family (viterbi /
forward / EM). Verify it against a brute-force enumeration of EVERY
segmentation path — the same spec the DuckDB recursive-CTE oracles
state — for all kernel modes, without a Spark session (the kernel is a
plain generator over pandas batches)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest


class _FakeBroadcast:
    def __init__(self, v):
        self.value = v


def _paths(w: str):
    """Every segmentation of w into pieces of length 1-3."""
    if not w:
        yield []
        return
    for k in (1, 2, 3):
        if k <= len(w):
            for rest in _paths(w[k:]):
                yield [w[:k]] + rest


def _brute(w: str, lp: dict[str, float]):
    """(best, logz, {piece: posterior expected count}) by enumeration."""
    scores, counts = [], []
    for path in _paths(w):
        if any(p not in lp for p in path):
            continue
        scores.append(sum(lp[p] for p in path))
        c: dict[str, int] = {}
        for p in path:
            c[p] = c.get(p, 0) + 1
        counts.append(c)
    best = max(scores)
    m = max(scores)
    logz = m + math.log(sum(math.exp(s - m) for s in scores))
    exp_counts: dict[str, float] = {}
    for s, c in zip(scores, counts):
        post = math.exp(s - logz)
        for p, n in c.items():
            exp_counts[p] = exp_counts.get(p, 0.0) + post * n
    return best, logz, exp_counts


@pytest.fixture(scope="module")
def fixture():
    # Non-uniform log-probs over a small alphabet; every len<=3 piece
    # present so all paths survive (matches the real kernel's setting
    # where the piece table contains every observed substring).
    words = ["a", "ab", "abc", "abca", "bcabca", "aaaaabbbbbcc"]
    assert all(len(w) <= 12 for w in words)
    pieces = sorted({w[j:j + k] for w in words for j in range(len(w))
                     for k in (1, 2, 3) if j + k <= len(w)})
    rng = np.random.RandomState(7)
    raw = rng.rand(len(pieces)) + 0.1
    tot = raw.sum()
    lp = {p: math.log(v / tot) for p, v in zip(pieces, raw)}
    freqs = [3, 1, 4, 1, 5, 9]
    return words, freqs, lp


def _run_kernel(words, freqs, lp, mode):
    from datalake_project_spark.queries.substrings import _lattice_kernel

    kern = _lattice_kernel(_FakeBroadcast(lp), mode)
    batches = [pd.DataFrame({"w": words[:3], "f": freqs[:3]}),
               pd.DataFrame({"w": [], "f": []}),  # empty batch tolerated
               pd.DataFrame({"w": words[3:], "f": freqs[3:]})]
    return pd.concat(list(kern(iter(batches))), ignore_index=True)


def test_best_and_logz_match_brute_force(fixture):
    words, freqs, lp = fixture
    expect = {w: _brute(w, lp) for w in words}
    for mode, idx in (("best", 0), ("logz", 1)):
        out = _run_kernel(words, freqs, lp, mode)
        assert sorted(out["w"]) == sorted(words)
        for _, row in out.iterrows():
            assert row["s"] == pytest.approx(expect[row["w"]][idx],
                                             abs=1e-9), (mode, row["w"])


def test_em_posteriors_and_likelihood_match_brute_force(fixture):
    words, freqs, lp = fixture
    out = _run_kernel(words, freqs, lp, "em")
    got = dict(zip(out["piece"], out["wt"]))
    # expected counts: f-weighted sum of per-word posterior counts
    want: dict[str, float] = {}
    want_lik = 0.0
    for w, f in zip(words, freqs):
        _, logz, exp_counts = _brute(w, lp)
        want_lik += f * logz
        for p, c in exp_counts.items():
            want[p] = want.get(p, 0.0) + f * c
    lik = got.pop("")  # reserved piece='' row carries sum f*logZ
    assert lik == pytest.approx(want_lik, rel=1e-12)
    assert set(got) == set(want)
    for p in want:
        assert got[p] == pytest.approx(want[p], rel=1e-9), p
    # total expected piece count equals total expected path length --
    # a conservation law the EM M-step relies on
    # (sum over pieces of E[count] == E[number of pieces per word] * f)
    # here just sanity: all weights positive
    assert (out["wt"][out["piece"] != ""] > 0).all()


def test_lik_mode_emits_only_likelihood_row(fixture):
    words, freqs, lp = fixture
    out = _run_kernel(words, freqs, lp, "lik")
    assert list(out["piece"]) == [""]
    want_lik = sum(f * _brute(w, lp)[1] for w, f in zip(words, freqs))
    assert out["wt"].iloc[0] == pytest.approx(want_lik, rel=1e-12)
