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


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path_factory):
    """Z-order clustering: after range-partition+sort by the interleaved
    key, a narrow slice on EITHER dimension must skip most row groups —
    where the 1-D shipdate-clustered layout skips only on shipdate and
    reads ~everything for an orderkey slice."""
    import pyspark.sql.functions as F

    from datalake_project_spark.operators.scale import interleave_bits

    root = tmp_path_factory.mktemp("zorder")
    li = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_shipdate", "l_quantity"))
    bits = 8
    stats = li.agg(F.min("l_orderkey").alias("k0"), F.max("l_orderkey").alias("k1"),
                   F.min(F.unix_date(F.to_date("l_shipdate"))).alias("d0"),
                   F.max(F.unix_date(F.to_date("l_shipdate"))).alias("d1")).first()
    k0, k1, d0, d1 = stats["k0"], stats["k1"], stats["d0"], stats["d1"]
    kb = ((F.col("l_orderkey") - k0) * ((1 << bits) - 1) / (k1 - k0)).cast("int")
    db = ((F.unix_date(F.to_date("l_shipdate")) - d0) * ((1 << bits) - 1)
          / (d1 - d0)).cast("int")
    z = li.withColumn("_z", interleave_bits(kb, db, bits))
    (z.repartitionByRange(16, "_z").sortWithinPartitions("_z")
     .drop("_z").write.mode("overwrite").parquet(str(root / "z")))
    (li.repartitionByRange(16, "l_shipdate").sortWithinPartitions("l_shipdate")
     .write.mode("overwrite").parquet(str(root / "date1d")))

    # narrow slices: ~1/8 of each domain
    k_lo, k_hi = k0, k0 + (k1 - k0) // 8
    d_mid = datetime.datetime(1997, 6, 1)
    d_hi = datetime.datetime(1997, 12, 1)

    zk_hit, zk_tot = _overlapping_row_groups(str(root / "z"), "l_orderkey", k_lo, k_hi)
    zd_hit, zd_tot = _overlapping_row_groups(str(root / "z"), "l_shipdate", d_mid, d_hi)
    ok_hit, ok_tot = _overlapping_row_groups(str(root / "date1d"), "l_orderkey", k_lo, k_hi)

    # z-order: meaningful skipping on BOTH dimensions
    assert zk_tot >= 16 and zk_hit <= zk_tot // 2
    assert zd_hit <= zd_tot // 2
    # 1-D date clustering: the orderkey slice reads everything
    assert ok_hit == ok_tot
