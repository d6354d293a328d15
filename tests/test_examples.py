"""Examples are runnable documentation — they must keep running as the
library evolves (the ivf_topk signature change broke retrieval.py silently
until a manual run caught it). Each example executes as a subprocess against
the tiny fixture; pass = exit 0."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    "batch_medallion.py",
    "lakehouse_sql.py",
    "streaming_cdc.py",
    "retrieval.py",
    "llm_curation.py",
    "mutable_lakehouse.py",
    "delta_interop.py",
    "layout_and_views.py",
    "pushdown_io.py",
    "warehouse_txn.py",
    "sketches.py",
    "stats_lifecycle.py",
    "streamed_index_optimize.py",
    "state_inspection.py",
]


@pytest.mark.parametrize("example", EXAMPLES)
def test_example_runs(example):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples", example)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
    )
    assert proc.returncode == 0, (
        f"{example} failed:\n{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
    )


def test_example_subprocess_leaves_no_temp_debris(tmp_path):
    """Examples are subprocesses, so the conftest scratch root can't cover
    them — the example itself opts in by calling
    `lakeflow.scratch.use_process_scratch()` at startup (`get_session`
    deliberately does NOT install it; library users keep default tempfile
    behavior — see the 00f4b4d scoping decision). Pin that: run one
    example with TMPDIR pointed at a fresh dir; after a clean exit the dir
    must hold nothing but pytest's own bookkeeping — every mkdtemp the
    example made (work dirs, stream checkpoints) rode the process scratch
    root and was removed at exit."""
    tdir = tmp_path / "ex-tmp"
    tdir.mkdir()
    env = dict(os.environ, TMPDIR=str(tdir))
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "examples", "streaming_cdc.py")],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=_REPO,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    left = [p.name for p in tdir.iterdir()]
    assert left == [], f"example left temp debris: {left}"
