"""Driver-window rotation planner.

The driver stamps only the FIRST 50 entries of ``queries()`` each round
(CORRECTNESS_r{N}.json). This tool computes, from the stamp history and
the live registry, what the next rotation should contain:

- every query never stamped in ANY round, grouped by module, so the
  next PRIORITY window can be drawn 49-fresh + flagship with family
  spread (the r8+ discipline);
- families whose members are ALL stamped (these need a NEW query to
  keep test_every_family_in_driver_window satisfied with a fresh slot,
  the way r9 added the crash-recovery / chunk-dedup / watermark-dedup
  queries);
- a coverage ledger: stamped / never-stamped / total.

Usage: python tools/rotation.py
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datalake_project_spark.queries import PRIORITY, load_all  # noqa: E402


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    stamped: set[str] = set()
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            stamped.update(json.load(open(f)).keys())
        except (json.JSONDecodeError, OSError):
            continue
    reg = load_all()
    never = [n for n in reg if n not in stamped]
    fams = Counter()
    by_mod: dict[str, list[str]] = {}
    for n in never:
        mod = inspect.getmodule(reg[n].fn).__name__.rsplit(".", 1)[-1]
        fams[mod] += 1
        by_mod.setdefault(mod, []).append(n)
    print(f"registry {len(reg)} | stamped {len(stamped & set(reg))} | "
          f"never-stamped {len(never)}")
    window = list(reg)[:50]
    fresh = [n for n in window if n not in stamped]
    print(f"current window: {len(fresh)}/50 never-stamped")
    print("\nnever-stamped by module:")
    for mod, n in fams.most_common():
        print(f"  {mod:14s} {n:3d}  e.g. {', '.join(by_mod[mod][:4])}")
    # families (by module) with zero never-stamped members: a future
    # window keeps them present only via a NEW query
    all_mods = {inspect.getmodule(s.fn).__name__.rsplit(".", 1)[-1]
                for s in reg.values()}
    exhausted = sorted(all_mods - set(by_mod))
    print(f"\nmodules fully stamped (need NEW queries for window spread): "
          f"{', '.join(exhausted) or '(none)'}")
    unlisted = [n for n in PRIORITY if n not in reg]
    if unlisted:
        print(f"\nWARNING: PRIORITY names not in registry: {unlisted}")


if __name__ == "__main__":
    main()
