"""Measured shuffle/spill audit for the heavy queries — evidence, not guesses.

For each query: run it to a full count() and diff the Spark stage-metric
totals (REST status API) before/after, attributing shuffle read/write
bytes, input bytes, and spill to that query. This is the number the plan
sweep can't give you: the sweep proves the plan SHAPE is right (no
cartesian, no global window, no row-UDF); this proves the plan COST —
how many bytes actually crossed a shuffle boundary, the quantity that
decides whether an operator survives a 100x scale-up.

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes SHUFFLEAUDIT.json at the repo root and prints one line per query.
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

# Default panel: the registry's heaviest families — one representative per
# expensive shape (inverted-index dedup, LSH banding, pairwise-block
# linkage, lattice DP, grouped-map Arrow, streaming drain, star join).
DEFAULT_PANEL = [
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "q_snapshot_diff",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_substring_removal",
    "q_dedup_semantic_clustered",
    "q_linkage_fellegi_sunter",
    "q_text_bpe_train",
    "q_text_collocations",
    "q_events_sessionize",
    "q_asof_join",
    "q_ann_cosine_topk",
    "q_embed_kmeans",
    "q_group_zscore",
    "q_salted_join_revenue",
    # round-5 continuation heavies: candidate-pruning audits and the
    # portable-signature MinHash estimator
    "q_dedup_prefix_filter",
    "q_dedup_bcubed",
    "q_dedup_minhash_estimator",
    "q_stats_permutation_test",
    "q_text_conditional_entropy",
]

FIELDS = (
    "shuffleReadBytes", "shuffleWriteBytes", "inputBytes",
    "memoryBytesSpilled", "diskBytesSpilled",
)


def _stage_totals(api: str) -> dict[str, int]:
    with urllib.request.urlopen(f"{api}/stages?status=complete", timeout=30) as r:
        stages = json.load(r)
    out = {f: 0 for f in FIELDS}
    for s in stages:
        for f in FIELDS:
            out[f] += int(s.get(f, 0) or 0)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[2:] or DEFAULT_PANEL

    registry = load_all()
    spark = get_spark("shuffle-audit",
                      extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.retainedStages": "5000"})
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl
    api = f"{ui}/api/v1/applications/{app_id}"

    # Warm the JVM so startup stages don't bill to the first query.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    rows = []
    for name in names:
        spec = registry.get(name)
        if spec is None:
            print(f"SKIP  {name}: not registered", flush=True)
            continue
        before = _stage_totals(api)
        t0 = time.monotonic()
        n = spec.fn(spark, sf_dir).count()
        sec = time.monotonic() - t0
        # Stage metrics land asynchronously; settle briefly.
        time.sleep(0.3)
        after = _stage_totals(api)
        d = {f: after[f] - before[f] for f in FIELDS}
        mb = {k: round(v / 1e6, 2) for k, v in d.items()}
        rows.append({"query": name, "rows": n, "sec": round(sec, 2), **mb})
        print(f"{name}: {sec:6.2f}s rows={n:<8} "
              f"shuffleR={mb['shuffleReadBytes']}MB "
              f"shuffleW={mb['shuffleWriteBytes']}MB "
              f"input={mb['inputBytes']}MB "
              f"spill={mb['memoryBytesSpilled'] + mb['diskBytesSpilled']}MB",
              flush=True)

    out = {"sf_dir": sf_dir, "unit": "MB", "queries": rows}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHUFFLEAUDIT.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
