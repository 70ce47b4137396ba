"""One-command round-close evidence chain (r7 verdict task #7).

Runs, STRICTLY SERIALIZED (the gates share .scratch build-once state —
two concurrent Spark gates produce transient fails that vanish solo):

  1. correctness gate   tools/check_correctness.py  (sf0.01, full registry)
  2. plan-smell sweep   tools/plan_sweep.py
  3. pytest             python -m pytest tests/ -q           (--no-pytest)
  4. bench              bench.py (min-of-N-trials CORE)      (--no-bench)
  5. bench diff         tools/bench_diff.py --old <ref>
  6. ladder summary     SCALELADDER.json exponents re-stated

then appends one receipts section to BENCHNOTES.md and prints it. Every
step's full output lands in .scratch/round_close/<step>.log (the
driver-tail-truncation lesson: grep the files, not a scrollback).

Usage:
  python tools/round_close.py [--old <git-ref>] [--no-pytest] [--no-bench]

Exit status: 0 only if gate has 0 FAIL and sweep has 0 offenders
(bench-diff regressions print but don't fail the close — the r7 series
proved they are usually host noise; adjudicate them in the notes).
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)  # python tools/round_close.py puts tools/ on
# sys.path, not the repo root — the package import below needs ROOT


def run_step(name: str, cmd: list[str], log_dir: str,
             env: dict | None = None) -> tuple[int, str]:
    """Run one step, tee-ing output to its log file; returns (rc, text)."""
    log = os.path.join(log_dir, f"{name}.log")
    print(f"== {name}: {' '.join(cmd)}  (log: {log})", flush=True)
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    with open(log, "w") as fh:
        proc = subprocess.run(cmd, cwd=ROOT, stdout=fh,
                              stderr=subprocess.STDOUT, env=full_env)
    with open(log) as fh:
        text = fh.read()
    print(f"   -> rc={proc.returncode}, {len(text.splitlines())} lines")
    return proc.returncode, text


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", default="HEAD",
                    help="git ref whose BENCHDETAIL.json to diff against")
    ap.add_argument("--no-pytest", action="store_true")
    ap.add_argument("--no-bench", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from datalake_project_spark.scratch import scratch_root
    log_dir = os.path.join(scratch_root(), "round_close")
    os.makedirs(log_dir, exist_ok=True)
    py = sys.executable
    lines: list[str] = []
    ok = True

    rc, text = run_step("gate", [py, "tools/check_correctness.py", args.sf],
                        log_dir)
    m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", text)
    fails = [ln for ln in text.splitlines() if ln.startswith("FAIL")]
    lines.append(f"- gate ({args.sf}): "
                 + (m.group(0) if m else f"UNPARSEABLE rc={rc}"))
    for ln in fails[:20]:
        lines.append(f"  - {ln}")
    ok &= bool(m) and m.group(2) == "0"

    rc, text = run_step("sweep", [py, "tools/plan_sweep.py", args.sf],
                        log_dir)
    m = re.search(r"(\d+) plans swept, (\d+) offenders", text)
    lines.append("- plan sweep: " + (m.group(0) if m else
                                     f"UNPARSEABLE rc={rc}"))
    for ln in [x for x in text.splitlines() if x.startswith("SMELL")][:20]:
        lines.append(f"  - {ln}")
    ok &= bool(m) and m.group(2) == "0"

    if not args.no_pytest:
        rc, text = run_step("pytest", [py, "-m", "pytest", "tests/", "-q"],
                            log_dir)
        tail = [ln for ln in text.splitlines()
                if re.search(r"\d+ (passed|failed)", ln)]
        lines.append(f"- pytest: {tail[-1].strip() if tail else f'rc={rc}'}")
        ok &= rc == 0

    if not args.no_bench:
        # Load-aware capture (r9 verdict task #4): a close that runs
        # right after pytest + the gate inherits residual host load and
        # commits an inflated core26 (r9: close 24.3 s vs solo 19.6 s
        # on identical code). The bench summary now carries a load
        # receipt — loadavg at capture, the median post-warmup trial
        # spread, and the fraction of CORE queries whose LAST trial
        # regressed >10% vs the pass before (0/26 on a quiet host —
        # warmup only ever speeds later passes up; a noisy neighbor
        # inflates them). When that fraction exceeds REGRESS_MAX the
        # capture re-runs (once) and the attempt with the lower core26
        # is kept, BENCHDETAIL.json included. Threshold calibration on
        # this host: a quiet capture measured 0/26 regressing, a
        # contaminated one (core26 +22%) measured 4/26 = 0.154 — the
        # trigger sits below the contaminated reading with margin.
        REGRESS_MAX = 0.12
        # Settle residual load FIRST: the close's own pytest/gate steps
        # leave the 1-min loadavg at 10+ for a couple of minutes, and a
        # DECAYING load inflates every trial monotonically — which the
        # regress-frac detector (built for load arriving mid-capture)
        # cannot see (r10: capture at loadavg 14.59 printed core26
        # 26.3 s vs 22.5 s solo with regress frac 0.0). Wait for the
        # 1-min average to drop below 2 before the first attempt,
        # bounded at 5 minutes.
        import time as _time
        waited = 0
        while os.getloadavg()[0] > 2.0 and waited < 300:
            _time.sleep(15)
            waited += 15
        if waited:
            print(f"   -> waited {waited}s for load to settle "
                  f"(loadavg now {os.getloadavg()[0]:.2f})", flush=True)
        attempts = []
        detail_path = os.path.join(ROOT, "BENCHDETAIL.json")
        for attempt in (1, 2):
            rc, text = run_step(f"bench{'' if attempt == 1 else attempt}",
                                [py, "bench.py"], log_dir)
            summary = None
            for ln in text.splitlines():
                if ln.startswith("{") and '"core26"' in ln:
                    summary = json.loads(ln)
            if not summary:
                # a crashed RE-RUN must not masquerade as a clean
                # single-capture close (r10 advice): note it in the
                # round log before falling through to the kept attempt
                if attempt > 1:
                    lines.append("- bench: re-run attempt failed "
                                 "(no summary line); keeping attempt 1")
                break
            with open(detail_path) as fh:
                attempts.append((summary, fh.read()))
            load = summary.get("load", {})
            regress = load.get("last_trial_regress_frac")
            if regress is None or regress <= REGRESS_MAX:
                break
            print(f"   -> last-trial regress frac {regress} > "
                  f"{REGRESS_MAX} (loadavg {load.get('load_avg_start')} "
                  f"-> {load.get('load_avg_end')}): re-running capture",
                  flush=True)
        if attempts:
            summary, detail = min(
                attempts, key=lambda a: a[0]["core26"])
            if len(attempts) > 1:
                with open(detail_path, "w") as fh:
                    fh.write(detail)  # keep the kept attempt's artifact
            load = summary.get("load", {})
            lines.append(
                f"- bench: core26 {summary['core26']} s "
                f"(min of {summary.get('core26_trials', 1)} trials"
                f"{', kept best of ' + str(len(attempts)) + ' captures' if len(attempts) > 1 else ''}), "
                f"headline total {summary['value']} s, "
                f"{summary['n_queries']} queries swept; "
                f"load receipt: avg {load.get('load_avg_start')} -> "
                f"{load.get('load_avg_end')}, steady spread "
                f"{load.get('steady_spread_median')}, regress frac "
                f"{load.get('last_trial_regress_frac')}")
        else:
            lines.append(f"- bench: NO SUMMARY LINE rc={rc}")
            ok = False

        rc, text = run_step(
            "bench_diff", [py, "tools/bench_diff.py", "--old", args.old],
            log_dir)
        moved = [ln for ln in text.splitlines()
                 if re.match(r"\s+\w+: [\d.]+s -> [\d.]+s", ln)]
        lines.append(f"- bench_diff vs {args.old}: rc={rc} "
                     f"({len(moved)} movers — adjudicate, don't panic: "
                     f"r6/r7 movers were host noise)")
        for ln in moved[:15]:
            lines.append(f"  - {ln.strip()}")

    ladder_path = os.path.join(ROOT, "SCALELADDER.json")
    if os.path.exists(ladder_path):
        with open(ladder_path) as fh:
            runs = json.load(fh).get("runs", [])
        # rows AT a plan-flip anchor rung measure the 1x->anchor plan
        # FLIP, not a scaling law (tools/scale_ladder.PLAN_FLIP_ANCHOR)
        # — keep them out of the headline "worst exponents" sort and
        # tag them instead, so the committed close never leads with a
        # retired pre-flip number (r10 verdict task #3)
        try:
            from tools.scale_ladder import PLAN_FLIP_ANCHOR
        except ImportError:
            PLAN_FLIP_ANCHOR = {}
        for r in runs:
            fac = r["factor"]
            panel = r.get("panel", [])
            flips = [x for x in panel
                     if fac <= PLAN_FLIP_ANCHOR.get(x["query"], 0)]
            ranked = [x for x in panel if x not in flips]
            worst = sorted(ranked,
                           key=lambda x: -max(x.get("time_exp", 0),
                                              x.get("shuffle_exp", 0)))[:3]
            worst_s = ", ".join(
                f"{w['query']} t={w['time_exp']} s={w['shuffle_exp']}"
                for w in worst)
            flip_s = ("" if not flips else "; PLAN_FLIP(at-anchor, see "
                      "anchored rows above this rung): "
                      + ", ".join(x["query"] for x in flips))
            lines.append(f"- ladder {fac}x: "
                         f"{len(panel)} queries; worst "
                         f"exponents: {worst_s}{flip_s}")

    stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M")
    block = (f"\n## Round close {stamp}\n\n"
             + "\n".join(lines)
             + f"\n\nOverall: {'GREEN' if ok else 'RED'}\n")
    with open(os.path.join(ROOT, "BENCHNOTES.md"), "a") as fh:
        fh.write(block)
    print(block)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
