"""Per-process scratch root (lakeflow/scratch.py) — the repo-wide answer
to the VERDICT r11 checkpoint-leak class: every harness routes ephemeral
mkdtemps into one pid-keyed dir removed at interpreter exit."""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

from lakeflow.scratch import use_process_scratch

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_scratch_routes_mkdtemp_and_is_idempotent():
    # conftest.py already installed the root at import time; calling again
    # must return the same root, and mkdtemp must land inside it.
    root = use_process_scratch()
    assert use_process_scratch() == root
    # mkdtemp-created (ADVICE r12 #3: pid recycling must never adopt a
    # stale root): pid prefix for debuggability + a random unique suffix.
    assert os.path.basename(root).startswith(
        f"lakeflow-scratch-{os.getpid()}-"
    )
    d = tempfile.mkdtemp(prefix="lakeflow-ckpt-")
    assert os.path.dirname(d) == root


def test_scratch_root_is_removed_at_interpreter_exit():
    # A child process creates scratch dirs through the override; after a
    # clean exit the whole root must be gone (the atexit hook, the part a
    # same-process test cannot observe).
    code = (
        "from lakeflow.scratch import use_process_scratch\n"
        "import tempfile\n"
        "use_process_scratch()\n"
        "print(tempfile.mkdtemp(prefix='lakeflow-ckpt-'))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        check=True,
        cwd=_REPO,
    ).stdout.strip()
    assert "lakeflow-scratch-" in out
    assert not os.path.exists(os.path.dirname(out))
