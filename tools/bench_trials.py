"""Round-close bench table: CORE-26 subtotal + the named heavy queries,
N trials, report MIN per entry (the r4 verdict's cross-round comparison
artifact — BENCH_rN driver captures can truncate and host noise on this
VM is ±20%, so each round writes a min-of-trials table into BENCHNOTES
that survives both).

Usage: python tools/bench_trials.py [trials]   (default 3; sf0.1)
Prints a markdown table to stdout; paste/append into BENCHNOTES.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import CORE  # noqa: E402
from datalake_project_spark.queries import load_all  # noqa: E402
from datalake_project_spark.session import get_spark  # noqa: E402

# The cross-round heavy set: the five slowest distinct operator families
# from the r4 tail, tracked by name so regressions in the expensive
# plans stay visible even when the suite total moves.
HEAVIES = [
    "q_text_unigram_em_round",
    "q_linkage_fellegi_sunter",
    "q_stream_outer_join",
    "q_dedup_resolved_by_quality",
    "q_group_zscore",
]


def main() -> None:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("bench-trials")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from datalake_project_spark.queries.similarity import _ivf_index_for
    _ivf_index_for(spark, sf_dir)

    core_totals: list[float] = []
    heavy: dict[str, list[float]] = {h: [] for h in HEAVIES}
    for t in range(trials):
        total = 0.0
        for name in CORE:
            t0 = time.perf_counter()
            registry[name].fn(spark, sf_dir).count()
            total += time.perf_counter() - t0
        core_totals.append(total)
        for h in HEAVIES:
            t0 = time.perf_counter()
            registry[h].fn(spark, sf_dir).count()
            heavy[h].append(time.perf_counter() - t0)
        print(f"# trial {t + 1}: core26={total:.2f}s", file=sys.stderr)

    la = os.getloadavg()
    print(f"| entry | min of {trials} trials (s) | all trials |")
    print("|---|---|---|")
    print(f"| core26 subtotal | {min(core_totals):.2f} | "
          f"{', '.join(f'{x:.2f}' for x in core_totals)} |")
    for h in HEAVIES:
        print(f"| {h} | {min(heavy[h]):.2f} | "
              f"{', '.join(f'{x:.2f}' for x in heavy[h])} |")
    print(f"\n(load avg at close: {la[0]:.2f} {la[1]:.2f} {la[2]:.2f}; "
          f"sf={sf_dir})")
    spark.stop()


if __name__ == "__main__":
    main()
