"""Pin the bench.py driver contract (VERDICT r5 ask #5): stdout must be
EXACTLY ONE compact JSON line — headline value + per-query times +
full_total — small enough that no driver capture window can truncate the
headline. The full-surface per-query detail lives on stderr only.

Runs bench restricted to two queries at sf0.001 so the guard costs seconds,
not the full sweep.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_is_one_compact_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "bench.py"),
            "--headline-only",
            "--queries",
            "q6_forecast_revenue,latest_event_per_user",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be one line, got {len(lines)}"
    rec = json.loads(lines[0])
    assert rec["unit"] == "sec" and rec["value"] > 0
    assert set(rec["queries"]) == {
        "q6_forecast_revenue",
        "latest_event_per_user",
    }
    # Two-pass headline (VERDICT r7 ask #2): the warm second pass over the
    # identical set separates environment/first-touch drift (pass-1-only)
    # from real plan regressions (visible in pass 2 as well).
    assert set(rec["queries_pass2"]) == set(rec["queries"])
    assert rec["value_pass2"] > 0
    # The compact line must stay far below any plausible capture window
    # even for the full headline set: ~30 bytes/query * ~60 queries * two
    # passes + fixed keys. Two queries here; assert the per-record
    # overhead is bounded.
    assert len(lines[0]) < 4096
