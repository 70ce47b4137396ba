"""Deletion-neighborhood blocking: the r8 losslessness boundary pins.

Round 7 blocked the lev<=2 linkage queries on 2-position MASK keys
('_' placeholders at masked positions). Masks only align same-position
substitutions: an insert+delete pair that SHIFTS the digit window (lev
2, but differing at up to 9 positions) shares no mask key — at sf0.1
masks silently dropped 1016 of 16858 sampled truth pairs. The r8 fix
is the TRUE FastSS deletion neighborhood (Bocek et al. 2007): key on
every string obtainable by REMOVING up to d characters; an optimal
alignment with s subs, dl dels, i ins (s+dl+i <= d) leaves a common
subsequence reachable by s+dl deletions on one side and s+i on the
other — every edit shape. These tests pin the boundary: the shift pair
masks provably miss, the theorem over random <=2-edit pairs, and
python-mirror == shipped Spark expression.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from datalake_project_spark.queries.relational5 import (
    _deletion_neighborhood,
)

_PROP = settings(max_examples=100, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _py_deletions(s: str, depth: int) -> set[str]:
    """Pure-python mirror of _deletion_neighborhood."""
    out = {s}
    if depth >= 1:
        out |= {s[:i] + s[i + 1:] for i in range(len(s))}
    if depth >= 2:
        out |= {s[:i] + s[i + 1:j] + s[j + 1:]
                for i in range(len(s)) for j in range(i + 1, len(s))}
    return out


def _py_masks(s: str) -> set[tuple[int, int, str]]:
    """The r7 position-mask key set (kept only as the counterexample)."""
    return {(i, j, s[:i] + "_" + s[i + 1:j] + "_" + s[j + 1:])
            for i in range(len(s)) for j in range(i + 1, len(s))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_shift_pair_masks_miss_deletions_catch(spark):
    """The documented boundary: a lev-2 insert+delete pair that shifts
    the whole digit window. Every position differs, so no 2-position
    mask key can match — the r7 blocker drops it — while one deletion
    from each side reaches the shared 8-char subsequence."""
    a, b = "123456789", "234567891"
    lev = spark.range(1).select(
        F.levenshtein(F.lit(a), F.lit(b)).alias("d")).first()["d"]
    assert lev == 2
    assert sum(ca != cb for ca, cb in zip(a, b)) == 9  # all positions
    assert _py_masks(a).isdisjoint(_py_masks(b))       # masks miss it
    assert _py_deletions(a, 2) & _py_deletions(b, 2)   # deletions don't
    # and the 1-deletion variant that bridges it is the shared window
    assert "23456789" in _py_deletions(a, 2) & _py_deletions(b, 2)


@given(base=st.text(alphabet="0123456789", min_size=9, max_size=9),
       data=st.data())
@_PROP
def test_deletion_neighborhood_covers_any_two_edits(base, data):
    """FastSS theorem over random equal-width pairs: apply any two
    edits (substitution, or an insert+delete keeping width 9) to a
    random 9-digit string; whenever lev <= 2 the depth-2 deletion
    neighborhoods intersect."""
    s = base
    for _ in range(2):
        kind = data.draw(st.sampled_from(["sub", "shift"]))
        pos = data.draw(st.integers(0, 8))
        ch = data.draw(st.sampled_from("0123456789"))
        if kind == "sub":
            s = s[:pos] + ch + s[pos + 1:]
        else:  # delete at pos, append ch: width-preserving ins+del
            s = s[:pos] + s[pos + 1:] + ch
    assert _lev(base, s) <= 4
    if _lev(base, s) <= 2:
        assert _py_deletions(base, 2) & _py_deletions(s, 2)


def test_spark_expression_matches_python_mirror(spark):
    """The shipped _deletion_neighborhood expression emits exactly the
    python-mirror variant set (array_distinct folds duplicate variants
    from repeated characters)."""
    samples = ["000000013", "123456789", "999999999", "010101010"[:9],
               "500001234"]
    df = spark.createDataFrame([(s,) for s in samples], "d string")
    for depth in (1, 2):
        got = {r["d"]: set(r["v"]) for r in df.select(
            "d", _deletion_neighborhood(F.col("d"), 9, depth).alias("v")
        ).collect()}
        for s in samples:
            assert got[s] == _py_deletions(s, depth), (s, depth)
