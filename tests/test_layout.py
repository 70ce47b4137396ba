"""Data-layout discipline: range-clustered writes tighten parquet
row-group statistics, which is what makes predicate pushdown actually
skip I/O at 100 TB.

Vanilla parquet has no file-level stats index (that's the Delta/Iceberg
add-on, documented in lake.py), but Spark's parquet reader skips ROW
GROUPS whose min/max exclude the pushed predicate. Whether that skips
anything is decided at WRITE time by clustering: a randomly partitioned
table has every row group spanning the whole value domain, so nothing
skips; a repartitionByRange + sortWithinPartitions write gives disjoint
ranges, so a narrow predicate touches ~1/N of the groups. This test
measures both layouts' real footer statistics with pyarrow and pins the
skipping ratio — the write-side half of the pushdown guarantee that
tests/test_plans.py pins on the read side.
"""

from __future__ import annotations

import datetime
import glob

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _overlapping_row_groups(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(row groups whose [min,max] intersects [lo,hi], total row groups)."""
    hit = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            stats = next(
                (rg.column(c).statistics for c in range(rg.num_columns)
                 if rg.column(c).path_in_schema == col), None)
            total += 1
            if stats is None:
                # no stats for this column -> a reader can't skip it
                hit += 1
                continue
            if not (stats.max < lo or stats.min > hi):
                hit += 1
    return hit, total


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("layout")
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_shipdate", "l_quantity"))
    (li.repartition(8)
     .write.mode("overwrite").parquet(str(root / "unsorted")))
    (li.repartitionByRange(8, "l_shipdate")
     .sortWithinPartitions("l_shipdate")
     .write.mode("overwrite").parquet(str(root / "clustered")))
    return str(root / "unsorted"), str(root / "clustered")


def test_clustered_layout_skips_row_groups(layouts):
    unsorted, clustered = layouts
    # one ~2-month slice of a ~7-year domain
    lo = datetime.datetime(1997, 6, 1)
    hi = datetime.datetime(1997, 8, 1)
    u_hit, u_total = _overlapping_row_groups(unsorted, "l_shipdate", lo, hi)
    c_hit, c_total = _overlapping_row_groups(clustered, "l_shipdate", lo, hi)
    # random layout: every row group spans the domain -> nothing skippable
    assert u_hit == u_total >= 8
    # clustered layout: the slice lives in at most 2 of >= 8 range buckets
    assert c_total >= 8 and c_hit <= 2


def test_layouts_agree_on_results(spark, layouts):
    """Layout must never change answers: the same predicate over both
    layouts returns identical aggregates."""
    from pyspark.sql import functions as F

    unsorted, clustered = layouts
    pred = (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-08-01")

    def agg(path):
        return (spark.read.parquet(path).where(pred)
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("l_quantity").alias("q")).first())

    a, b = agg(unsorted), agg(clustered)
    assert (a["n"], a["q"]) == (b["n"], b["q"]) and a["n"] > 0
