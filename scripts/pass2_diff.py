#!/usr/bin/env python
"""Mechanical application of the BASELINE.md warm-pass DECISION RULE to
the two newest committed ``bench_pass2_r*.json`` artifacts.

The rule (BASELINE.md r12, amended r13): the round-over-round signal is
the committed warm-pass pair — ``value_pass2_min`` when BOTH rounds
carry the min-of-two-warm-passes fields (r14+), else ``value_pass2``.
Within ±5%: flat. Beyond: classify per query — a uniform shift (median
ratio ≈ every ratio, no outlier above the sampling floor) is
environmental; outliers above the floor are plan-regression candidates
for the repeat protocol. The floor is ×1.5 for min-era comparisons and
×1.8 for single-sample ones (measured same-code spreads, BASELINE.md
r13 "Per-query sampling floor" / "Min-of-two warm passes").

Reads committed files only; run it idle or loaded, it measures nothing.

Usage: python scripts/pass2_diff.py [prev.json cur.json]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_two() -> tuple[dict, dict]:
    rounds = []
    for f in glob.glob(os.path.join(_REPO, "bench_pass2_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if m:
            rounds.append((int(m.group(1)), f))
    rounds.sort()
    if len(rounds) < 2:
        raise SystemExit("need two committed bench_pass2_r*.json artifacts")
    with open(rounds[-2][1]) as fh:
        prev = json.load(fh)
    with open(rounds[-1][1]) as fh:
        cur = json.load(fh)
    return prev, cur


def classify(prev: dict, cur: dict) -> str:
    min_era = "queries_pass2_min" in prev and "queries_pass2_min" in cur
    key = "queries_pass2_min" if min_era else "queries_pass2"
    tkey = "value_pass2_min" if min_era else "value_pass2"
    floor = 1.5 if min_era else 1.8
    pq, cq = prev[key], cur[key]
    pt, ct = prev[tkey], cur[tkey]
    lines = [
        f"signal: {tkey} ({'min-of-2' if min_era else 'single-sample'} era, "
        f"floor x{floor})",
        f"r{prev['round']} {pt:.3f}s -> r{cur['round']} {ct:.3f}s  "
        f"x{ct / pt:.3f}" if pt else "prev total is 0",
    ]
    if pt and abs(ct / pt - 1.0) <= 0.05:
        lines.append("verdict: FLAT (within the +-5% band) — rule 1 stops here")
        return "\n".join(lines)
    # Rule 2: per-query ratios over the shared >=0.2s set.
    shared = [
        n for n in set(pq) & set(cq) if max(pq[n], cq[n]) >= 0.2 and pq[n]
    ]
    ratios = sorted((cq[n] / pq[n], n) for n in shared)
    med = ratios[len(ratios) // 2][0] if ratios else float("nan")
    outliers = [(n, r) for r, n in ratios if r >= floor]
    lines.append(f"per-query: n={len(ratios)} median x{med:.3f}")
    # Calib confirmation gate: meaningful only when both probes were
    # quiet (disp < 0.3) AND the ratio is big enough to matter. A flat
    # calib must never be read as proof of a plan regression — the probe
    # is pure-CPU and blind to IO/scheduler-bound box differences
    # (BASELINE.md r13 "calib-blind box mode").
    pc, cc = prev.get("calib"), cur.get("calib")
    pd, cd = prev.get("calib_disp"), cur.get("calib_disp")
    if pc and cc:
        quiet = (
            pd is not None and cd is not None and pd < 0.3 and cd < 0.3
        )
        lines.append(
            f"calib: {pc} (disp {pd}) -> {cc} (disp {cd})  x{cc / pc:.2f}"
            f" [{'usable' if quiet else 'probe too jittery — ignore'}]"
        )
    if not outliers:
        lines.append(
            "verdict: UNIFORM shift, no per-query outlier above the floor "
            "— environmental (box/load), not plan cost"
        )
    else:
        names = ", ".join(f"{n} x{r:.2f}" for n, r in outliers)
        lines.append(
            f"verdict: {len(outliers)} quer{'y' if len(outliers) == 1 else 'ies'} "
            f"above the x{floor} floor — plan-regression candidates for the "
            f"repeat protocol: {names}"
        )
    return "\n".join(lines)


if __name__ == "__main__":
    if len(sys.argv) == 3:
        with open(sys.argv[1]) as fh:
            prev = json.load(fh)
        with open(sys.argv[2]) as fh:
            cur = json.load(fh)
    else:
        prev, cur = latest_two()
    print(classify(prev, cur))
