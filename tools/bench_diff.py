"""Round-over-round bench regression diff (r6 verdict task #8).

BENCHDETAIL.json covers the FULL registry each round, so a plan
regression in a tail query is visible in the series — but only if
someone diffs it. This prints every query that got >1.5x slower than
the prior round while costing over 1 s (the same thresholds the judge
applies by hand), plus the mirror-image improvements for the round
notes. Exit 1 when regressions exist so the round-close script can't
miss them.

Usage:
  python tools/bench_diff.py                      # old = HEAD's copy
  python tools/bench_diff.py --old <git-ref>      # old = that commit's copy
  python tools/bench_diff.py --old path/old.json  # old = a file
  python tools/bench_diff.py --new path/new.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(spec: str) -> dict:
    """A file path, or a git ref whose committed BENCHDETAIL.json to use."""
    if os.path.exists(spec):
        with open(spec) as fh:
            return json.load(fh)
    out = subprocess.run(
        ["git", "-C", ROOT, "show", f"{spec}:BENCHDETAIL.json"],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", default="HEAD")
    ap.add_argument("--new", default=os.path.join(ROOT, "BENCHDETAIL.json"))
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=1.0,
                    help="ignore entries under this many seconds (new)")
    args = ap.parse_args()

    old = load(args.old)["queries"]
    new = load(args.new)["queries"]

    regressed, improved = [], []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None or t_old <= 0:
            continue
        if t_new >= args.floor and t_new / t_old > args.ratio:
            regressed.append((name, t_old, t_new, t_new / t_old))
        elif t_old >= args.floor and t_old / t_new > args.ratio:
            improved.append((name, t_old, t_new, t_old / t_new))

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    if regressed:
        print(f"REGRESSED >{args.ratio}x (and >= {args.floor}s):")
        for name, o, n, r in sorted(regressed, key=lambda t: -t[3]):
            print(f"  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    else:
        print(f"no regressions >{args.ratio}x above {args.floor}s")
    if improved:
        print(f"improved >{args.ratio}x:")
        for name, o, n, r in sorted(improved, key=lambda t: -t[3]):
            print(f"  {name}: {o:.2f}s -> {n:.2f}s ({r:.2f}x faster)")
    if added:
        print(f"new queries ({len(added)}): {', '.join(added[:10])}"
              + (" ..." if len(added) > 10 else ""))
    if removed:
        print(f"dropped queries ({len(removed)}): {', '.join(removed)}")
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())
