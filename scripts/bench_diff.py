#!/usr/bin/env python
"""Cross-round full-sweep drift table (VERDICT r12 ask #8).

Diffs the two newest committed ``bench_full_r*.json`` artifacts per query
and prints the round-record table: top regressions with ratios, plus the
names explained by registry growth/retirement — so drift attribution is a
committed artifact of every round record instead of a judge exercise.

Reads committed files only; run it idle or loaded, it measures nothing.

Usage: python scripts/bench_diff.py [N]   (default N=5 top regressions)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_two() -> tuple[dict, dict]:
    # Numeric round sort — lexicographic would order r100 before r99.
    # Files matching the glob but not the round pattern (scratch copies
    # like bench_full_r13-retry.json) are ignored, not crashed on.
    rounds = []
    for f in glob.glob(os.path.join(_REPO, "bench_full_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            rounds.append((int(m.group(1)), f))
    rounds.sort()
    if len(rounds) < 2:
        raise SystemExit("need two committed bench_full_r*.json artifacts")

    def load(path: str) -> dict:
        with open(path) as fh:
            return json.load(fh)

    return load(rounds[-2][1]), load(rounds[-1][1])


def diff_table(prev: dict, cur: dict, top_n: int = 5) -> str:
    pq, cq = prev["queries"], cur["queries"]
    shared = set(pq) & set(cq)
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))
    # Rank by ratio among shared queries costing >=0.2s in either round —
    # sub-200ms entries flip 2x on scheduler noise alone and would bury
    # the real signal.
    ranked = sorted(
        (n for n in shared if max(pq[n], cq[n]) >= 0.2),
        key=lambda n: cq[n] / pq[n] if pq[n] else float("inf"),
        reverse=True,
    )
    lines = [
        f"full sweep r{prev['round']} -> r{cur['round']}: "
        f"{prev['full_total']:.1f}s/{prev['full_n']}q -> "
        f"{cur['full_total']:.1f}s/{cur['full_n']}q",
        f"calib (min/disp): {prev.get('calib')}/{prev.get('calib_disp')} -> "
        f"{cur.get('calib')}/{cur.get('calib_disp')}",
        f"added ({len(added)}): {', '.join(added) or '-'}",
        f"removed ({len(removed)}): {', '.join(removed) or '-'}",
        f"top {top_n} per-query regressions (shared, >=0.2s):",
    ]
    def ratio(n: str) -> str:
        # pq can be 0.0 (values are 3-decimal-rounded): sorted first via
        # the inf guard above, printed as inf rather than crashing.
        return f"{cq[n] / pq[n]:.2f}" if pq[n] else "inf"

    lines += [
        f"  {n:40s} {pq[n]:7.3f} -> {cq[n]:7.3f}  x{ratio(n)}"
        for n in ranked[:top_n]
    ]
    # BASELINE.md §r13 sampling floor: single-sample ratios below x1.8 are
    # within the observed same-code spread; flag only what clears it.
    hot = [n for n in ranked if not pq[n] or cq[n] / pq[n] >= 1.8]
    lines.append(
        f"above the x1.8 single-sample significance floor: "
        f"{', '.join(hot) or 'none'}"
    )
    return "\n".join(lines)


if __name__ == "__main__":
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    prev, cur = latest_two()
    print(diff_table(prev, cur, top))
