"""Pandas API on Spark (pyspark.pandas): the drop-in surface pandas
users reach for before learning DataFrame/SQL. Parity-check a
representative slice — groupby-agg, filtering, derived columns, and
sort — against both plain pandas on the same data and the engine's
native DataFrame answer, so the three front doors (pandas API, native
DataFrame, SQL) provably agree."""

from __future__ import annotations

import math
import warnings

import pandas as pd
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def psdf(spark):
    warnings.filterwarnings(
        "ignore", category=UserWarning, module="pyspark.pandas")
    import pyspark.pandas as ps

    return ps.read_parquet(f"{SF}/orders.parquet")


def test_groupby_agg_matches_pandas_and_native(spark, psdf):
    gb = psdf.groupby("o_orderpriority")["o_totalprice"]
    got = pd.DataFrame({
        "count": gb.count().sort_index().to_pandas(),
        "sum": gb.sum().sort_index().to_pandas(),
    })

    raw = pd.read_parquet(f"{SF}/orders.parquet")
    want = (raw.groupby("o_orderpriority")["o_totalprice"]
            .agg(["count", "sum"]).sort_index())
    assert list(got.index) == list(want.index)
    assert (got["count"] == want["count"]).all()
    # Relative tolerance: the sums are ~1e7-1e8, where an absolute 1e-6
    # is near double accumulation error and partition-count sensitive.
    assert all(math.isclose(a, b, rel_tol=1e-9)
               for a, b in zip(got["sum"], want["sum"]))

    native = {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s"))
        .collect()
    }
    for k in got.index:
        assert native[k][0] == got.loc[k, "count"]
        assert math.isclose(native[k][1], got.loc[k, "sum"], rel_tol=1e-9)


def test_filter_assign_sort_matches_pandas(psdf):
    got = (psdf[psdf["o_totalprice"] > 200_000]
           .assign(bucket=lambda d: (d["o_totalprice"] // 100_000))
           .groupby("bucket")["o_orderkey"].count()
           .sort_index().to_pandas())
    raw = pd.read_parquet(f"{SF}/orders.parquet")
    want = (raw[raw["o_totalprice"] > 200_000]
            .assign(bucket=lambda d: (d["o_totalprice"] // 100_000))
            .groupby("bucket")["o_orderkey"].count().sort_index())
    assert got.to_dict() == want.to_dict()
