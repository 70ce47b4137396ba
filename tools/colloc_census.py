"""Bucket census for q_text_collocations' ladder adjudication (r9).

The 1x-anchored shuffle exponents (1.17-1.18) with super-linear
incremental legs at 10->30->60x are suspected to be MAP-SIDE-COMBINE
DILUTION, not quadratic work: the groupBy('b') exchange ships one row
per (scan-partition, distinct-bigram) — partial aggregation dedups
within a task, so shuffle rows sit between the global distinct count
and min(total occurrences, n_tasks x distinct). At small factors a
common bigram collapses to a handful of rows; as the corpus grows the
scan fans out over more partitions and the per-copy vocabularies are
disjoint (ladder design), so the dedup hit-rate falls and shuffle rows
transition toward their linear asymptote. The transition region is
exactly where super-linear INCREMENTAL legs appear, even though the
asymptotic slope is ~1.

This script measures, per cached ladder fixture, the three quantities
that bound the exchange: total bigram occurrences (occ), global
distinct bigrams (dist), and the exact map-side-combined row count
(census = sum over scan partitions of distinct-in-partition). If
census growth tracks the measured shufW growth and census/occ -> 1,
the legs are adjudicated: saturation curve, linear asymptote.

Usage: python tools/colloc_census.py [factor ...]   (default 1 10 30 60 100)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake_project_spark.catalog import Catalog  # noqa: E402
from datalake_project_spark.functions import text as T  # noqa: E402
from datalake_project_spark.scratch import scratch_root  # noqa: E402
from datalake_project_spark.session import get_spark  # noqa: E402


def census(spark, sf_dir: str) -> dict:
    d = Catalog(spark, sf_dir).table("documents")
    tok = d.select(T.tokens("text").alias("ws"))
    n = F.size("ws")
    bg_arr = F.zip_with(
        F.slice("ws", 1, n - 1), F.slice(F.col("ws"), 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b))
    bg = (tok.where(n >= 2)
          .select(F.explode(bg_arr).alias("b"),
                  F.spark_partition_id().alias("pid")))
    row = (bg.agg(F.count(F.lit(1)).alias("occ")).collect()[0])
    dist = bg.select("b").distinct().count()
    cen = (bg.dropDuplicates(["pid", "b"]).count())
    nparts = bg.select("pid").distinct().count()
    return {"occ": row["occ"], "dist": dist, "census": cen,
            "n_scan_parts": nparts}


def main():
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 30, 60, 100]
    spark = get_spark("colloc-census")
    out = {}
    for f in factors:
        sf_dir = ("/root/testdata/sf0.1" if f == 1 else
                  os.path.join(scratch_root(), f"scale{f}x_sf0.1"))
        if not os.path.isdir(sf_dir):
            print(f"factor {f}: fixture missing at {sf_dir}", flush=True)
            continue
        out[f] = census(spark, sf_dir)
        print(f, json.dumps(out[f]), flush=True)
    fs = sorted(out)
    for a, b in zip(fs, fs[1:]):
        import math
        g = math.log(out[b]["census"] / out[a]["census"]) / math.log(b / a)
        print(f"census incremental exp {a}->{b}: {g:.2f}", flush=True)


if __name__ == "__main__":
    main()
