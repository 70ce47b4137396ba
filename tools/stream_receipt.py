"""Streaming drain receipts: run registered streaming queries in a warm
session with a StreamingQueryListener attached and dump per-micro-batch
progress (durationMs, stateOperators commitTimeMs / numShufflePartitions
/ state rows) plus wall time and the window's CPU-steal%%.

This is the guide §1 "measure first" loop for the availableNow drains,
where stage attribution misses the cost (state-store commits happen
inside tasks but the overhead is per-instance-fixed, visible only in
the progress metrics).

Usage: python tools/stream_receipt.py q_stream_stream_join [...] \
           [--trials 3] [--out plans/r13/receipt.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        vals = [int(x) for x in fh.readline().split()[1:]]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def main() -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    from datalake_project_spark.queries import load_all
    from datalake_project_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trials = 3
    out_path = None
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--trials":
            trials = int(argv[i + 1])
            args.remove(argv[i + 1])
        if a == "--out":
            out_path = argv[i + 1]
            args.remove(argv[i + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("stream-receipt")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    progresses: list[dict] = []

    class Rec(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    rec = Rec()
    spark.streams.addListener(rec)
    report: dict[str, list[dict]] = {}
    try:
        for name in args:
            report[name] = []
            for t in range(trials):
                n0 = len(progresses)
                s0, k0 = _steal()
                t0 = time.perf_counter()
                n = registry[name].fn(spark, sf_dir).count()
                wall = round(time.perf_counter() - t0, 3)
                s1, k1 = _steal()
                time.sleep(1.0)  # listener events are async
                batches = []
                for p in progresses[n0:]:
                    so = p.get("stateOperators") or []
                    batches.append({
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "durationMs": p.get("durationMs"),
                        "state": [{
                            "operatorName": s.get("operatorName"),
                            "commitTimeMs": s.get("commitTimeMs"),
                            "numShufflePartitions":
                                s.get("numShufflePartitions"),
                            "numRowsTotal": s.get("numRowsTotal"),
                            "numStateStoreInstances":
                                s.get("numStateStoreInstances"),
                        } for s in so],
                    })
                commit_sum = sum(s["commitTimeMs"] or 0
                                 for b in batches for s in b["state"])
                entry = {
                    "trial": t + 1, "wall_s": wall, "rows": n,
                    "steal_pct": round(100.0 * (s1 - s0)
                                       / max(k1 - k0, 1), 1),
                    "commit_ms_sum": commit_sum,
                    "n_batches": len(batches),
                    "batches": batches,
                }
                report[name].append(entry)
                print(f"# {name} trial {t+1}: wall {wall}s, "
                      f"commit sum {commit_sum} ms, "
                      f"{len(batches)} batches, "
                      f"steal {entry['steal_pct']}%", file=sys.stderr)
    finally:
        spark.streams.removeListener(rec)

    text = json.dumps(report, indent=1)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(text + "\n")
    else:
        print(text)
    spark.stop()


if __name__ == "__main__":
    main()
