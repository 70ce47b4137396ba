"""Scale-ladder fixture invariants (pure DuckDB — no Spark session).

The ladder's scaling exponents are only meaningful if the synthesized
F-x fixture replicates structure without cross-copy interaction. The
r7 rotation design (digit d -> d+k) silently violated this under the
r8 TRUE deletion-neighborhood blocking keys: deleting one char bridges
a value shift wherever base digits run consecutively (measured 21.9%
cross-copy candidates at 10x). These tests pin the r8 disjoint-alphabet
design's guarantees on a small factor-4 build so a future fixture edit
cannot silently regress them again.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.scale_ladder import STRIDE, build_scaled

BASE = "/root/testdata/sf0.001"
FACTOR = 4

DELETION_SEGS = """
    WITH dig AS (SELECT c_custkey, c_custkey // {stride} AS copy,
                        c_nationkey, substr(c_name, 10, 9) AS d
                 FROM read_parquet('{path}/customer.parquet'))
    SELECT c_custkey, copy, c_nationkey, seg FROM (
      SELECT c_custkey, copy, c_nationkey, d AS seg FROM dig
      UNION ALL
      SELECT c_custkey, copy, c_nationkey,
             substr(d, 1, i - 1) || substr(d, i + 1)
      FROM dig, (SELECT unnest(range(1, 10)) AS i)
      UNION ALL
      SELECT c_custkey, copy, c_nationkey,
             substr(d, 1, m.i - 1) || substr(d, m.i + 1, m.j - m.i - 1)
             || substr(d, m.j + 1)
      FROM dig, (SELECT a.i AS i, b.j AS j
                 FROM (SELECT unnest(range(1, 10)) AS i) a,
                      (SELECT unnest(range(1, 10)) AS j) b
                 WHERE a.i < b.j) m)
"""


@pytest.fixture(scope="module")
def scaled(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ladder") / f"scale{FACTOR}x")
    build_scaled(BASE, FACTOR, out)
    return out


def test_customer_copies_have_zero_cross_copy_candidates(scaled):
    """Under the production blocking keys (2-deletion neighborhoods
    within nation), candidates never cross copies and every copy's
    candidate count equals the base fixture's exactly."""
    con = duckdb.connect()
    segs = DELETION_SEGS.format(stride=STRIDE, path=scaled)
    rows = con.sql(f"""
        WITH segs AS ({segs}),
        cand AS (
          SELECT DISTINCT a.c_custkey AS ak, b.c_custkey AS bk,
                 a.copy AS ac, b.copy AS bc
          FROM segs a JOIN segs b
            ON a.c_nationkey = b.c_nationkey AND a.seg = b.seg
           AND a.c_custkey < b.c_custkey)
        SELECT ac, bc, COUNT(*) FROM cand GROUP BY 1, 2 ORDER BY 1, 2
    """).fetchall()
    cross = [(a, b, n) for a, b, n in rows if a != b]
    assert cross == [], f"cross-copy candidates: {cross[:5]}"
    within = {a: n for a, b, n in rows if a == b}
    assert set(within) == set(range(FACTOR))
    assert len(set(within.values())) == 1, within  # all equal the base


def test_customer_copies_have_zero_cross_copy_matches(scaled):
    """The comparator itself (lev <= 2 within nation) never matches
    across copies: cross-copy names differ by >= 3 edits by design."""
    con = duckdb.connect()
    n = con.sql(f"""
        SELECT COUNT(*)
        FROM read_parquet('{scaled}/customer.parquet') a
        JOIN read_parquet('{scaled}/customer.parquet') b
          ON a.c_nationkey = b.c_nationkey
         AND a.c_custkey < b.c_custkey
         AND a.c_custkey // {STRIDE} <> b.c_custkey // {STRIDE}
        WHERE levenshtein(a.c_name, b.c_name) <= 2
    """).fetchone()[0]
    assert n == 0


def test_documents_cross_copy_jaccard_zero(scaled):
    """Per-copy vocabulary tagging keeps cross-copy token sets
    disjoint: no token appears in two copies (so cross-copy shingle
    Jaccard is exactly 0 and shingle dfs replicate, not inflate)."""
    con = duckdb.connect()
    n = con.sql(f"""
        WITH tok AS (
          SELECT doc_id // {STRIDE} AS copy,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                 AS t
          FROM read_parquet('{scaled}/documents.parquet'))
        SELECT COUNT(*) FROM (
          SELECT t FROM tok GROUP BY t
          HAVING COUNT(DISTINCT copy) > 1)
    """).fetchone()[0]
    assert n == 0


def test_factor_above_100_refused():
    with pytest.raises(AssertionError, match="factor <= 100"):
        build_scaled(BASE, 101, "/tmp/never_built_scale101x")
