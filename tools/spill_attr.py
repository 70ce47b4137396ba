"""Per-SQL-node spill attribution — the pass that finds WHERE a ladder
rung's spill lives (r8 lesson: the attribution pass, not the panel
summary, finds the unsized call site; r9 used this to delete the
Fellegi-Sunter verify-arm and prefix-filter spills).

Runs ONE query solo against a fixture with the Spark UI enabled, then
walks the largest SQL execution's node metrics and prints every node
that carries a spill metric, plus its output rows — enough to tell a
pipelined Sort/HashAggregate sharing one task's memory slice (fix:
smaller per-partition target on the sized exchange) from an unsized
exchange at session width (fix: wire num_partitions at the call site).

Solo matters: sequential panel runs inherit storage-pool pressure from
earlier queries' checkpoints (the bcubed/minhash-estimator phantom
spills) — attribute solo before believing a panel number.

Usage: python tools/spill_attr.py <query> [fixture_dir]
(default fixture: the cached 100x ladder dir)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_project_spark.queries import load_all  # noqa: E402
from datalake_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    qname = sys.argv[1]
    sf_dir = (sys.argv[2] if len(sys.argv) > 2 else
              "/root/repo/.scratch/scale100x_sf0.1")
    spark = get_spark("spill-attr", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.retainedStages": "2000",
        "spark.sql.ui.retainedExecutions": "100"})
    q = load_all()[qname]
    t0 = time.time()
    n = q.fn(spark, sf_dir).count()
    print(f"rows={n} wall={time.time() - t0:.1f}s", flush=True)

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications"))[0]["id"]
    sqls = json.load(urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app}/sql"
        f"?length=1000&details=true&planDescription=false"))
    sqls.sort(key=lambda s: s.get("duration", 0), reverse=True)
    # localCheckpoints split a query into several executions: walk the
    # top few by duration, not just the head
    for s in sqls[:5]:
        header = f"sql id {s['id']} dur {s.get('duration')}"
        shown = False
        for node in s.get("nodes", []):
            mets = {m["name"]: m["value"] for m in node.get("metrics", [])}
            spills = {k: v for k, v in mets.items() if "spill" in k.lower()}
            if not spills:
                continue
            if not shown:
                print(header, flush=True)
                shown = True
            rows = mets.get("number of output rows")
            print(" ", node["nodeId"], node["nodeName"], "|", spills,
                  "| rows:", rows, flush=True)


if __name__ == "__main__":
    main()
