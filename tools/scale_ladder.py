"""Scale-ladder receipts: measure, don't argue.

Every "survives 100x" claim in the repo is a plan-shape argument
verified at sf0.1. This tool turns the claims for the heavy families
into MEASURED scaling exponents: it synthesizes a FACTOR-x scaled copy
of the sf0.1 fixture (replicate-and-perturb, preserving within-copy
duplicate/skew structure while keeping copies disjoint — the way a
genuinely larger corpus behaves), runs the heavy panel at 1x and
FACTOR-x, and records wall time + shuffle bytes + the implied exponent
per query (exponent = log(t_Fx / t_1x) / log(F); ~1.0 = linear).

Replication design (copy k of F, stride-offset surrogate keys):
- documents: copy 0 is the original; copies 1..F-1 re-express the text
  as lowercase tokens each tagged with a copy letter — a per-copy
  VOCABULARY BIJECTION. Within-copy near-dup structure is preserved
  (tagging both members of a pair preserves their shingle overlap);
  cross-copy Jaccard is exactly 0 (disjoint vocabularies); shingle df
  distributions replicate per copy instead of inflating 10x. That is
  how a real 10x corpus grows: new content, same skew profile.
- customer: copy k rewrites the name's 9-digit identifier block as
  GROUP-CODE + DISJOINT-ALPHABET TRAIL: the three leading
  (constant-'0' in base) digits become group char g = k//5 (20
  distinct symbols) repeated three times, and the six trailing digits
  map through sub-alphabet s = k%5 — five pairwise-disjoint 10-char
  alphabets (digits, a-j, k-t, A-J, K-T). Within-copy edit distances —
  and therefore d<=2 record-linkage match AND deletion-neighborhood
  blocking structure — are preserved exactly (common-prefix lemma
  strips the constant group code; one character bijection covers the
  whole trail; group-char deletions are fungible so variant equalities
  re-split depth-for-depth). Cross-copy pairs are BOTH non-matching
  (lev >= 3: three group subs, or >= 4 unmappable trail chars) and
  non-blocking under TRUE deletion neighborhoods: across groups every
  <=2-deletion variant still LEADS with its group char (>= 1 of 3
  survives) so variants differ at char 1; within a group a variant
  keeps >= 4 trail chars from its own alphabet, which the other
  sub-copy's string cannot contain. So candidates, matches, and
  blocking keys all replicate exactly x F with ZERO cross-copy
  interaction, for factor <= 100 (20 groups x 5 subs). This replaces
  the r7 rotation design (digit d -> d+k value shifts): position-mask
  keys could never align a value shift, but true deletion keys bridge
  one whenever the base digits run consecutively — measured 21.9%
  cross-copy candidates at 10x. (Earlier failures, kept for the
  record: the r5 suffix tag left blocked positions identical across
  copies — candidates x F^2; the r7 first-cut affine maps collided on
  the constant digits — shuffle exp 1.44. The fixture must emulate
  NEW entities, not re-keyed old ones.)
- lineitem: all graph-bearing keys (orderkey/partkey/suppkey) offset
  per copy -> F disjoint copies of the co-purchase graph: identical
  degree distribution, identical k-core peel depth, F x the edges.
- embeddings: per-(copy, vec, dim) LCG relative noise (+-5%) keeps the
  cluster geometry while preventing exact-duplicate vectors.
- everything else: symlinked from the base fixture.

Usage:
  python tools/scale_ladder.py [--factor 10] [--base /root/testdata/sf0.1]
                               [query ...]
Writes SCALELADDER.json at the repo root.
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

STRIDE = 10_000_000

# One representative per heavy family named by the r5 verdict: inverted-
# index dedup candidate generation, MinHash-LSH banding, winnowing
# substring dedup, Fellegi-Sunter + sorted-neighborhood record linkage,
# k-core peeling, BM25 ranking, cluster-restricted SemDeDup.
PANEL = [
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_lsh",
    "q_dedup_winnow_resolved",
    "q_linkage_fellegi_sunter",
    "q_linkage_sorted_neighborhood",
    "q_record_linkage",
    "q_graph_kcore",
    "q_text_bm25_topk",
    "q_dedup_semantic_clustered",
    # r6 extension: the remaining heavy audit shapes + the events lane
    "q_dedup_prefix_filter",
    "q_dedup_bcubed",
    "q_dedup_minhash_estimator",
    "q_text_collocations",
    "q_events_sessionize",
    "q_group_zscore",
    # r7: the streaming lane joins the panel — a real micro-batch drain
    # (availableNow over the staged events fixture) so state-store and
    # sink costs are measured, not argued. Sessionize emits real rows at
    # every factor (heavy-hitters' support threshold empties at sf0.1).
    "q_stream_sessionize",
    # r8: the bench top-10 heavies that had no ladder row (r7 verdict
    # task #2) — each carries a bounded-state claim the row verifies:
    # unigram-EM state is the distinct-word table; knn-label has a
    # FIXED 200-vector probe side (O(n*200), linear in n); the savings
    # ladder re-runs the bucketed candidate arcs; the stream outer
    # join's state is keyed and watermark-bounded; the bucketed join
    # pays its shuffle at write time; equi-depth histogram is one
    # approx-quantile pass.
    "q_text_unigram_em_round",
    "q_embed_knn_label_accuracy",
    "q_dedup_savings_ladder",
    "q_stream_outer_join",
    "q_bucketed_join_roundtrip",
    "q_stats_equidepth_histogram",
    # r9: the last unmeasured bench heavies (r8 verdict task #5) —
    # stream-stream interval join (state keyed + watermark-bounded),
    # TwoNN intrinsic dimension (fixed 100-probe Arrow matmul scan),
    # dedup-resolved-by-quality (bucketed candidates + one quality agg).
    "q_stream_stream_join",
    "q_embed_intrinsic_dimension",
    "q_dedup_resolved_by_quality",
    # r11: the two r10 operators with data-dependent output (r10
    # verdict task #6) — the nearest as-of join must keep its window
    # keyed by user_id (candidates replicate xF under the disjoint
    # per-copy user offsets), and the fixed-radius range search must
    # stay a zero-exchange probe-broadcast scan whose only growth is
    # the result set.
    "q_asof_join_nearest",
    "q_ann_range_search",
    # r11: the two new inverted-index dedup members — bag (multiset)
    # trigram Jaccard and idf-weighted Jaccard — same sum-df^2
    # candidate discipline as q_dedup_ngram_jaccard, measured rather
    # than argued.
    "q_dedup_bag_jaccard",
    "q_dedup_idf_weighted_jaccard",
    # r11b: content-defined chunking — the Arrow convolution kernel's
    # linearity receipt (workers return digests only), and its
    # near-dup companion's one-exchange digest discipline.
    "q_multimodal_cdc_chunking",
    "q_multimodal_cdc_near_dup",
]

SYMLINK_TABLES = ["region", "nation", "supplier", "part", "orders"]

# Queries whose 1x plan differs STRUCTURALLY from their at-scale plan
# (bench-scale inputs broadcast / skip the sized exchanges entirely), so
# a 1x-anchored exponent measures the plan FLIP, not the scaling law —
# the r8/r9 adjudications measured both linkage queries at 1.02-1.13
# between plan-consistent rungs while the 1x-anchored headline printed
# 1.4-1.9. Rows at factors ABOVE the anchor get their headline
# time/shuffle exponents recomputed INCREMENTALLY against the anchor
# rung (same plan both sides); the 1x-anchored values stay in
# *_vs_1x so nothing is hidden.
PLAN_FLIP_ANCHOR = {
    "q_record_linkage": 10,
    "q_linkage_fellegi_sunter": 10,
}


def apply_plan_flip_anchors(runs: list[dict]) -> None:
    """Recompute anchored exponents for every stored run, idempotently,
    from the raw per-row byte/time measurements."""
    import math

    by_factor = {r["factor"]: {row["query"]: row for row in r["panel"]}
                 for r in runs}
    for r in runs:
        fac = r["factor"]
        for row in r["panel"]:
            anchor = PLAN_FLIP_ANCHOR.get(row["query"])
            if not anchor and "anchored_at" in row:
                # query was REMOVED from PLAN_FLIP_ANCHOR: restore the
                # 1x-anchored exponents from the raw per-row fields so
                # a stale persisted row can't keep a retired anchor
                # forever (r10 advice)
                t1 = max(row["sec_1x"], 0.05)
                s1 = max(row["shufW_1x"], 1)
                row["time_exp"] = round(
                    math.log(max(row["sec_Fx"], 0.05) / t1)
                    / math.log(fac), 2)
                row["shuffle_exp"] = round(
                    math.log(max(row["shufW_Fx"], 1) / s1)
                    / math.log(fac), 2)
                for k in ("anchored_at", "time_exp_vs_1x",
                          "shuffle_exp_vs_1x"):
                    row.pop(k, None)
                continue
            if not anchor or fac <= anchor or anchor not in by_factor:
                continue
            base = by_factor[anchor].get(row["query"])
            if not base:
                continue
            s_a = max(base["shufW_Fx"], 1)
            s_f = max(row["shufW_Fx"], 1)
            t_a = max(base["sec_Fx"], 0.05)
            t_f = max(row["sec_Fx"], 0.05)
            # original 1x-anchored values, recomputed from raw fields so
            # repeated passes never compound
            t1 = max(row["sec_1x"], 0.05)
            s1 = max(row["shufW_1x"], 1)
            row["time_exp_vs_1x"] = round(
                math.log(max(row["sec_Fx"], 0.05) / t1) / math.log(fac), 2)
            row["shuffle_exp_vs_1x"] = round(
                math.log(s_f / s1) / math.log(fac), 2)
            row["anchored_at"] = anchor
            row["time_exp"] = round(
                math.log(t_f / t_a) / math.log(fac / anchor), 2)
            row["shuffle_exp"] = round(
                math.log(s_f / s_a) / math.log(fac / anchor), 2)

# build-once queries persist an index/layout into scratch keyed by the
# fixture (bucket tables, IVF index): their FIRST run at a fresh factor
# pays the one-time write. The 1x warmup already absorbs that at 1x;
# these get an extra untimed warmup at Fx so the timed row measures the
# steady-state query — which is the claim (pay the shuffle at write
# time, amortize over every join after).
WARMUP_AT_FX = {"q_bucketed_join_roundtrip"}

FIELDS = ("shuffleReadBytes", "shuffleWriteBytes", "inputBytes",
          "memoryBytesSpilled", "diskBytesSpilled")


def build_scaled(base: str, factor: int, out: str) -> str:
    """Synthesize the scaled fixture with DuckDB (single pass per table);
    idempotent via a _READY marker."""
    import duckdb

    # the group digit is k // 5 — one symbol from a 20-char alphabet,
    # only while factor <= 100; beyond that substr() returns '' and
    # copies silently collide (names shorten, cross-copy interaction
    # returns). Checked before any table is written.
    assert factor <= 100, (
        f"group-code customer fixture supports factor <= 100 "
        f"(20 groups x 5 sub-alphabets), got {factor}")
    marker = os.path.join(out, "_READY")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads = {max(4, (os.cpu_count() or 8) // 2)}")

    def rep(table_sql: str, name: str) -> None:
        con.sql(f"COPY ({table_sql}) TO '{out}/{name}.parquet' "
                f"(FORMAT PARQUET)")

    letters = "abcdefghijklmnopqrstuvwxyz"
    # two-letter copy tag: supports up to 676 copies (a single letter
    # wraps past k=26, silently UN-tagging copies 26+ — the factor-30
    # run that caught it produced 5 identical sub-corpora and x245 pair
    # output instead of x30)
    tag = (f"substr('{letters}', CAST(k // 26 + 1 AS INT), 1) || "
           f"substr('{letters}', CAST(k % 26 + 1 AS INT), 1)")
    rep(f"""
        SELECT doc_id + k * {STRIDE} AS doc_id,
               CASE WHEN k = 0 THEN text
                    ELSE array_to_string(list_transform(
                        regexp_extract_all(lower(text), '[a-z0-9]+'),
                        t -> t || {tag}), ' ')
               END AS text,
               lang, source,
               CASE WHEN k = 0 THEN n_chars
                    ELSE CAST(length(array_to_string(list_transform(
                        regexp_extract_all(lower(text), '[a-z0-9]+'),
                        t -> t || {tag}), ' '))
                        AS BIGINT)
               END AS n_chars
        FROM read_parquet('{base}/documents.parquet'),
             range(0, {factor}) r(k)
        """, "documents")
    # copy k name = prefix + GROUP code (char g = k//5 from a 20-symbol
    # alphabet, repeated three times) + the six trailing digits mapped
    # through SUB-alphabet s = k%5 (five pairwise-DISJOINT 10-char
    # alphabets). r8 redesign: the r7 rotation copies were value-shifts
    # (digit d -> d+k), which position-mask keys could never align but
    # TRUE deletion-neighborhood keys can (deleting one char bridges a
    # value-shift whenever the base digits run consecutively — measured
    # 21.9% cross-copy candidates at 10x). The disjoint-alphabet form
    # is deletion-proof: across groups, every <=2-deletion variant
    # keeps >=1 of 3 group chars and group chars LEAD the string, so
    # variants of different groups differ at char 1; within a group,
    # a variant keeps >=4 of 6 trail chars, all from its own disjoint
    # alphabet, which the other sub-copy's string cannot contain. And
    # within-copy edit structure is EXACT: lev("GGG"+u1,"GGG"+u2) =
    # lev(u1,u2) = lev(t1,t2) (common-prefix lemma + one character
    # bijection over the whole trail), and the deletion-variant
    # candidate set maps 1:1 (group-char deletions are fungible, so any
    # cross-split variant equality re-splits to a same-depth one).
    # Overwriting the three leading digits is only injective while they
    # are constant-'0' in the base — assert it (base custkey < 10^6).
    max_ck = con.sql(f"SELECT MAX(c_custkey) FROM "
                     f"read_parquet('{base}/customer.parquet')").fetchone()[0]
    assert max_ck < 10**6, (
        f"group-code fixture needs base custkey < 1e6, got {max_ck}")
    rep(f"""
        SELECT c_custkey + k * {STRIDE} AS c_custkey,
               CASE WHEN k = 0 THEN c_name
                    ELSE substr(c_name, 1, 9)
                         || repeat(substr('0UVWXYZuvwxyz2345678',
                                          CAST(k // 5 AS INT) + 1, 1), 3)
                         || translate(substr(c_name, 13, 6), '0123456789',
                                      substr('0123456789abcdefghij'
                                             || 'klmnopqrstABCDEFGHIJ'
                                             || 'KLMNOPQRST',
                                             CAST(k % 5 AS INT) * 10 + 1,
                                             10))
               END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{base}/customer.parquet'),
             range(0, {factor}) r(k)
        """, "customer")
    rep(f"""
        SELECT l_orderkey + k * {STRIDE} AS l_orderkey,
               l_partkey + k * {STRIDE} AS l_partkey,
               l_suppkey + k * {STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM read_parquet('{base}/lineitem.parquet'),
             range(0, {factor}) r(k)
        """, "lineitem")
    rep(f"""
        SELECT vec_id + k * {STRIDE} AS vec_id,
               CASE WHEN k = 0 THEN embedding
                    ELSE [CAST(embedding[CAST(d AS INT)] *
                          (1.0 + ((((1103515245 * (vec_id * 1024
                                    + k * 64 + d) + 12345) % 2147483648)
                                   / 2147483648.0) - 0.5) * 0.1)
                          AS FLOAT)
                          FOR d IN range(1, len(embedding) + 1)]
               END AS embedding,
               label
        FROM read_parquet('{base}/embeddings.parquet'),
             range(0, {factor}) r(k)
        """, "embeddings")
    rep(f"""
        SELECT event_id + k * {STRIDE} AS event_id, ts,
               user_id + k * {STRIDE} AS user_id,
               event_type, value, props
        FROM read_parquet('{base}/events.parquet'),
             range(0, {factor}) r(k)
        """, "events")
    for t in SYMLINK_TABLES:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base}/{t}.parquet", dst)
    con.close()
    with open(marker, "w") as fh:
        fh.write(f"factor={factor} base={base}\n")
    return out


def _stage_totals(api: str) -> dict[str, int]:
    with urllib.request.urlopen(f"{api}/stages?status=complete",
                                timeout=30) as r:
        stages = json.load(r)
    out = {f: 0 for f in FIELDS}
    for s in stages:
        for f in FIELDS:
            out[f] += int(s.get(f, 0) or 0)
    return out


def drain(df) -> int:
    """Materialize EVERY output column (one JVM hash-agg), returning the
    row count. A bare ``count()`` lets Catalyst prune unreferenced
    columns — for attach-a-column shapes (left-join as-of: output rows =
    left rows regardless of match) that deletes the window/join work
    entirely and the 'measurement' reads 59 bytes of shuffle for a plan
    whose real exchange is megabytes. Hashing a struct of all columns
    pins the full delivered plan; for aggregate-shaped queries the added
    cost is one expression over an already-computed result."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # XOR fold, not SUM: summing 2^63-scale hashes overflows under
        # ANSI mode; XOR is closed over long and still pins every column
        F.expr("bit_xor(xxhash64(struct(*)))").alias("h")).collect()[0]
    return row["n"]


def run_panel(spark, api: str, registry, sf_dir: str,
              names: list[str]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    for name in names:
        before = _stage_totals(api)
        t0 = time.perf_counter()
        n = drain(registry[name].fn(spark, sf_dir))
        dt = round(time.perf_counter() - t0, 3)
        after = _stage_totals(api)
        delta = {f: after[f] - before[f] for f in FIELDS}
        out[name] = {"sec": dt, "rows": n, **delta}
        print(f"# {os.path.basename(sf_dir)} {name}: {dt:.1f}s "
              f"shufW={delta['shuffleWriteBytes']/1e6:.1f}MB "
              f"spill={delta['diskBytesSpilled']/1e6:.1f}MB "
              f"({n} rows)", file=sys.stderr, flush=True)
    return out


def main() -> int:
    import argparse
    import math

    from datalake_project_spark.scratch import scratch_root

    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or PANEL

    scaled = os.path.join(scratch_root(),
                          f"scale{args.factor}x_"
                          f"{os.path.basename(args.base)}")
    print(f"# building {args.factor}x fixture at {scaled}",
          file=sys.stderr, flush=True)
    build_scaled(args.base, args.factor, scaled)

    registry = load_all()
    spark = get_spark("scale-ladder", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4049",
        # Ladder rungs hold up to 100x sf0.1 in ONE local[32] JVM; the
        # session default (8g) models 32 executors sharing 8 GB — a
        # memory-starvation artifact no real deployment has (each
        # executor owns its heap). 24g keeps per-task execution memory
        # at a realistic ~450 MB so the ladder measures SCALING, not
        # single-JVM heap contention (kcore at 60x threw
        # UNABLE_TO_ACQUIRE_MEMORY under 8g while the identical plan
        # ran clean solo). Spill accounting is unaffected — a plan
        # that needs to spill still spills and is still recorded.
        "spark.driver.memory": "24g",
        # the shuffle readings sum COMPLETED stages via the UI API; the
        # default 1000-stage retention evicts early stages under many-
        # job queries (the unigram-EM driver-stepped DP runs hundreds),
        # making cumulative deltas go NEGATIVE mid-panel — retain
        # enough history that sums are monotone for the whole run
        "spark.ui.retainedStages": "300000",
        "spark.ui.retainedJobs": "300000",
    })
    api = "http://localhost:4049/api/v1/applications"
    with urllib.request.urlopen(api, timeout=30) as r:
        app_id = json.load(r)[0]["id"]
    api = f"{api}/{app_id}"
    # Untimed warmup pass at 1x: codegen/JIT/broadcast-thread spin-up
    # otherwise bills to the 1x measurements and fakes a SUPER-linear
    # exponent down (or negative) — the same discipline bench.py applies.
    print("# warmup pass (untimed)", file=sys.stderr, flush=True)
    for name in names:
        drain(registry[name].fn(spark, args.base))

    r1 = run_panel(spark, api, registry, args.base, names)
    for name in sorted(WARMUP_AT_FX & set(names)):
        print(f"# Fx build warmup (untimed): {name}",
              file=sys.stderr, flush=True)
        drain(registry[name].fn(spark, scaled))
    rF = run_panel(spark, api, registry, scaled, names)

    rows = []
    for name in names:
        t1, tF = max(r1[name]["sec"], 0.05), max(rF[name]["sec"], 0.05)
        s1 = max(r1[name]["shuffleWriteBytes"], 1)
        sF = max(rF[name]["shuffleWriteBytes"], 1)
        rows.append({
            "query": name,
            "sec_1x": r1[name]["sec"], "sec_Fx": rF[name]["sec"],
            "shufW_1x": r1[name]["shuffleWriteBytes"],
            "shufW_Fx": rF[name]["shuffleWriteBytes"],
            # spill_Fx keeps the r6 definition (disk + the in-memory size
            # of spilled data); spill_disk_Fx is the actual bytes that
            # hit disk — the number capacity planning cares about
            "spill_Fx": rF[name]["diskBytesSpilled"]
            + rF[name]["memoryBytesSpilled"],
            "spill_disk_Fx": rF[name]["diskBytesSpilled"],
            "time_exp": round(math.log(tF / t1)
                              / math.log(args.factor), 2),
            "shuffle_exp": round(math.log(sF / s1)
                                 / math.log(args.factor), 2),
        })
    result = {"factor": args.factor, "base": args.base,
              "panel": rows}
    # merge into the rung ladder: one entry per factor, panel rows merged
    # BY QUERY NAME so a targeted re-run (scale_ladder.py --factor 30
    # q_one_query) refreshes that row without clobbering the full panel
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "SCALELADDER.json")
    runs = []
    try:
        with open(out_path) as fh:
            prior = json.load(fh)
        runs = prior.get("runs", [prior] if "panel" in prior else [])
    except (OSError, ValueError):
        pass
    same = [r for r in runs if r.get("factor") == args.factor]
    if same:
        merged = {row["query"]: row for row in same[0].get("panel", [])}
        merged.update({row["query"]: row for row in rows})
        result["panel"] = [merged[n] for n in
                           sorted(merged, key=lambda n:
                                  (PANEL.index(n) if n in PANEL else 99,
                                   n))]
    runs = [r for r in runs if r.get("factor") != args.factor]
    runs.append(result)
    runs.sort(key=lambda r: r.get("factor", 0))
    apply_plan_flip_anchors(runs)
    with open(out_path, "w") as fh:
        json.dump({"runs": runs}, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
