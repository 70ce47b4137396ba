"""Per-query stage-level profiler (r12 optimization round).

Runs one or more registered queries in a warm session with the Spark
event log enabled, then attributes wall time to jobs and stages from the
log: per-stage task time, shuffle read/write bytes, spill, and the
operator names in each stage's RDD scope. This is the guide §1 "where is
the time actually going" loop without the UI (disabled in this sandbox).

Usage:
    python tools/profile_query.py q_graph_kcore [q_other ...] [--trials 2]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def profile(names: list[str], trials: int = 2, sf_dir: str | None = None,
            top_stages: int = 12) -> None:
    from datalake_project_spark.queries import load_all
    from datalake_project_spark.session import get_spark

    sf = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import shutil
    log_dir = "/tmp/spark-events-profile"
    shutil.rmtree(log_dir, ignore_errors=True)
    os.makedirs(log_dir, exist_ok=True)

    registry = load_all()
    spark = get_spark("profile", extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": log_dir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    })
    spark.read.parquet(f"{sf}/region.parquet").count()

    windows: dict[str, list[tuple[float, float, float]]] = defaultdict(list)
    for t in range(trials):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name}#t{t}")
            t0 = time.time()
            n = registry[name].fn(spark, sf).count()
            t1 = time.time()
            windows[name].append((t0, t1, t1 - t0))
            print(f"[trial {t}] {name}: {t1 - t0:.3f}s ({n} rows)",
                  flush=True)
            spark.sparkContext.setJobDescription(None)
    spark.stop()

    # Parse the event log: map jobs -> description, stages -> metrics.
    events = []
    for root, _dirs, files in os.walk(log_dir):
        for f in files:
            p = os.path.join(root, f)
            try:
                with open(p) as fh:
                    for line in fh:
                        try:
                            events.append(json.loads(line))
                        except json.JSONDecodeError:
                            continue
            except (OSError, UnicodeDecodeError):
                continue

    job_desc: dict[int, str] = {}
    job_span: dict[int, list[float]] = {}
    stage_job: dict[int, int] = {}
    stage_info: dict[int, dict] = {}
    for e in events:
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            job_desc[jid] = e.get("Properties", {}).get(
                "spark.job.description", "")
            job_span[jid] = [e.get("Submission Time", 0) / 1e3, 0]
            for sid in e.get("Stage IDs", []):
                stage_job[sid] = jid
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in job_span:
                job_span[jid][1] = e.get("Completion Time", 0) / 1e3
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            stage_info.setdefault(sid, {}).update({
                "name": si.get("Stage Name", ""),
                "tasks": si.get("Number of Tasks", 0),
                "sub": si.get("Submission Time", 0) / 1e3,
                "done": si.get("Completion Time", 0) / 1e3,
            })
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            agg = stage_info.setdefault(sid, {})
            agg["task_time_ms"] = agg.get("task_time_ms", 0) + \
                m.get("Executor Run Time", 0)
            agg["cpu_ms"] = agg.get("cpu_ms", 0) + \
                m.get("Executor CPU Time", 0) / 1e6
            agg["gc_ms"] = agg.get("gc_ms", 0) + m.get("JVM GC Time", 0)
            agg["deser_ms"] = agg.get("deser_ms", 0) + \
                m.get("Executor Deserialize Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            agg["sh_read"] = agg.get("sh_read", 0) + \
                sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            agg["fetch_wait_ms"] = agg.get("fetch_wait_ms", 0) + \
                sr.get("Fetch Wait Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            agg["sh_write"] = agg.get("sh_write", 0) + \
                sw.get("Shuffle Bytes Written", 0)
            agg["sh_write_ms"] = agg.get("sh_write_ms", 0) + \
                sw.get("Shuffle Write Time", 0) / 1e6
            agg["spill_disk"] = agg.get("spill_disk", 0) + \
                m.get("Disk Bytes Spilled", 0)
            agg["py_total"] = agg.get("py_total", 0)

    # Attribute jobs to (query, trial) via the description we set.
    for name in names:
        for t in range(trials):
            tag = f"{name}#t{t}"
            jids = [j for j, d in job_desc.items() if d == tag]
            if not jids:
                continue
            wall = windows[name][t][2]
            jobs_wall = sum(job_span[j][1] - job_span[j][0] for j in jids
                            if job_span[j][1])
            print(f"\n=== {tag}: wall {wall:.3f}s, {len(jids)} jobs, "
                  f"sum(job wall) {jobs_wall:.3f}s, "
                  f"gap (driver/planning) {wall - jobs_wall:.3f}s")
            srows = []
            for j in sorted(jids):
                for sid, jj in stage_job.items():
                    if jj != j or sid not in stage_info:
                        continue
                    s = stage_info[sid]
                    if "sub" not in s:
                        continue
                    srows.append((s["done"] - s["sub"], sid, j, s))
            srows.sort(reverse=True)
            print(f"  top stages by wall (stage-wall task-n task-time cpu gc "
                  f"shRd shWr spill  name)")
            for wallst, sid, j, s in srows[:top_stages]:
                print(f"  {wallst:7.3f}s s{sid:<4} j{j:<3} "
                      f"n={s.get('tasks', 0):<4} "
                      f"tt={s.get('task_time_ms', 0) / 1e3:7.2f}s "
                      f"cpu={s.get('cpu_ms', 0) / 1e3:7.2f}s "
                      f"gc={s.get('gc_ms', 0) / 1e3:5.2f}s "
                      f"rd={s.get('sh_read', 0) / 1e6:8.2f}MB "
                      f"wr={s.get('sh_write', 0) / 1e6:8.2f}MB "
                      f"sp={s.get('spill_disk', 0) / 1e6:6.1f}MB "
                      f" {s.get('name', '')[:60]}")


if __name__ == "__main__":
    argv = sys.argv[1:]
    trials = 2
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--trials":
            trials = int(argv[i + 1])
            i += 2
        else:
            args.append(argv[i])
            i += 1
    profile(args, trials=trials)
