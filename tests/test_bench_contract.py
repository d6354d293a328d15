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
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_stdout_is_one_compact_json_line():
    # CPUS=8 (was 4): the contract under test is the stdout SHAPE, not the
    # timings, and the dominant cost of this guard is bench.py's fixed
    # 200M-row calibration probe, which runs ~2x faster at 8 local cores
    # on this 32-core box (r14 suite-wall-time work, VERDICT ask #1).
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
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
    # from real plan regressions (visible in pass 2 as well). Pass-2
    # PER-QUERY detail lives on stderr ONLY — r8 proved a second 56-entry
    # dict on stdout overflows the driver's ~2000-char capture window and
    # the whole record fails to parse (BENCH_r08.json parsed=null).
    assert "queries_pass2" not in rec
    assert rec["value_pass2"] > 0
    # The min-of-two-warm-passes fields (r13 post-gate) ride the
    # committed artifact ONLY — the stdout record stays under the
    # driver's capture budget (the static worst-case guard measured
    # 1908 bytes with the extra key).
    assert "value_pass2_min" not in rec and "queries_pass2b" not in rec
    # Hardware calibration probe (r10): a fixed CPU-bound workload whose
    # cross-round ratio attributes uniform drift to the environment by
    # measurement instead of inference.
    assert rec["calib"] > 0
    pass2_lines = [
        ln for ln in proc.stderr.splitlines() if ln.startswith("PASS2 ")
    ]
    assert len(pass2_lines) == 1
    pass2b_lines = [
        ln for ln in proc.stderr.splitlines() if ln.startswith("PASS2B ")
    ]
    assert len(pass2b_lines) == 1
    assert set(json.loads(pass2_lines[0][len("PASS2 "):])) == set(
        rec["queries"]
    )
    assert len(lines[0]) < 1900


def test_full_headline_record_fits_driver_capture_window():
    """Static guard against the r8 regression class: a worst-case stdout
    record for the FULL headline set (every BENCH query at a 4-digit
    seconds value) must stay under the driver's ~2000-char tail capture,
    or the whole line fails to parse exactly like BENCH_r08 did."""
    import bench

    record = {
        "metric": "lakeflow headline queries, end-to-end (noop sink)",
        "value": 9999.999,
        "unit": "sec",
        "queries": {n: 999.999 for n in bench.BENCH_QUERIES},
        "value_pass2": 9999.999,
        "sf": 0.1,
        # stdout carries calib + calib_disp only (the decision-rule pair);
        # calib_med rides the committed artifacts — the full triple plus
        # per-query detail overflows this very budget.
        "calib": 999.999,
        "calib_disp": 9.999,
        "full_total": 9999.999,
        "full_n": 999,
        "full_failed": 999,
    }
    line = json.dumps(record, separators=(",", ":"))
    assert len(line) < 1900, (
        f"headline stdout record is {len(line)} bytes — the driver's "
        f"capture window truncates ~2000; move detail to stderr or trim "
        f"the headline set"
    )


def test_committed_bench_files_keep_two_pass_invariant():
    """VERDICT r8 ask #4: the committed BENCH record must carry both pass
    totals, and the warm pass must not be slower than the cold one (the
    between-pass cache clear regressed if it is). r8's record predates the
    stdout slimming and its parsed field is null (the very bug fixed this
    round) — recover its values from the raw tail so the invariant is
    still checked."""
    import glob
    import re

    files = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))
    assert files
    checked = 0
    for path in files:
        rec = json.load(open(path))
        parsed = rec.get("parsed")
        if parsed is None:
            tail = rec.get("tail", "")
            m1 = re.search(r'"value":\s*([0-9.]+)', tail)
            m2 = re.search(r'"value_pass2":\s*([0-9.]+)', tail)
            if not m2:
                continue  # single-pass era (r1-r7) or no recoverable data
            v2 = float(m2.group(1))
            v1 = float(m1.group(1)) if m1 else None
        else:
            if "value_pass2" not in parsed:
                continue  # single-pass era
            v1, v2 = parsed["value"], parsed["value_pass2"]
        assert v2 > 0
        if v1 is not None:
            # Small epsilon: two totals of 56 noisy timings can tie.
            assert v2 <= v1 * 1.02, (
                f"{path}: warm pass {v2} slower than cold {v1} — the "
                f"between-pass cache clear regressed"
            )
        checked += 1
    assert checked >= 1, "no two-pass BENCH record found to check"


def test_full_sweep_covers_the_registry_by_construction():
    """VERDICT r9 ask #5: full_n == len(QUERIES) is the completeness
    contract of the sweep. Statically: the headline set must be a subset
    of the registry and headline ∪ tail (constructed exactly as bench.py
    constructs it) must BE the registry — no query can be silently
    excluded from the denominator."""
    import bench
    from lakeflow.queries import QUERIES

    headline = set(bench.BENCH_QUERIES)
    assert headline <= set(QUERIES), (
        f"BENCH_QUERIES not registered: {sorted(headline - set(QUERIES))}"
    )
    tail = {n for n in QUERIES if n not in bench.BENCH_QUERIES}
    assert headline | tail == set(QUERIES)
    assert len(headline) + len(tail) == len(QUERIES)


def test_committed_full_sweeps_completed_without_failures():
    """Runtime half of the full_n contract: a committed round record whose
    sweep dropped queries (full_failed present, or full_n short of the
    registry the round ran against) means the driver's headline was
    measured over a silently smaller surface. The registry only grows, so
    full_n may lag len(QUERIES) mid-round but may never exceed it."""
    import glob

    from lakeflow.queries import QUERIES

    files = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))
    assert files
    latest_with_full = None
    for path in files:
        rec = json.load(open(path)).get("parsed") or {}
        if "full_n" in rec:
            latest_with_full = (path, rec)
    assert latest_with_full, "no committed record carries full_n"
    path, rec = latest_with_full
    assert "full_failed" not in rec, (
        f"{path}: the committed sweep dropped {rec['full_failed']} queries"
    )
    # A historical record's denominator is the registry AS OF that round:
    # names retired SINCE (scripts/retired_queries.json, SCALE.md §10)
    # legitimately make full_n exceed today's len(QUERIES) by exactly the
    # retired count — anything beyond that is a real denominator break.
    # Basename-tolerant round extraction: the driver also commits suffixed
    # per-round records (BENCH_r13_c8.json, its 8-cpu run), which carry
    # full_n too — "r13_c8" still belongs to round 13.
    rec_round = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
    with open(os.path.join(_REPO, "scripts", "retired_queries.json")) as f:
        retired_since = sum(
            1
            for info in json.load(f)["retired"].values()
            if info["round"] > rec_round
        )
    assert rec["full_n"] <= len(QUERIES) + retired_since, (
        f"{path}: full_n={rec['full_n']} exceeds the registry "
        f"({len(QUERIES)}) plus {retired_since} post-r{rec_round} "
        f"retirements — denominator no longer means the registry"
    )


def test_committed_pass2_artifact_exists_parses_and_covers_headline():
    """VERDICT r10 ask #2: the warm-pass per-query detail must survive as
    a committed artifact, not stderr lines. The newest bench_pass2_r*.json
    must parse, carry a positive calib and the normalized reading, and its
    pass-2 dict must cover the ENTIRE current headline set (a partial
    --queries run never writes the artifact, so a gap means a query failed
    mid-pass and the committed record silently shrank)."""
    import glob

    import bench

    files = sorted(glob.glob(os.path.join(_REPO, "bench_pass2_r*.json")))
    assert files, "no committed bench_pass2_r*.json artifact"
    rec = json.load(open(files[-1]))
    assert rec["calib"] > 0
    assert rec["pass2_per_calib"] > 0
    got = set(rec["queries_pass2"])
    missing = set(bench.BENCH_QUERIES) - got
    assert not missing, f"{files[-1]}: pass-2 detail missing {sorted(missing)}"
    assert abs(sum(rec["queries_pass2"].values()) - rec["value_pass2"]) < 0.01
    # Min-of-two-warm-passes fields (r13 post-gate): mandatory from r14
    # artifacts on; when present, the min dict must be the true per-query
    # min and value_pass2_min its sum.
    if rec.get("round", 0) >= 14:
        assert "queries_pass2_min" in rec and "queries_pass2b" in rec, (
            f"{files[-1]}: r14+ artifact lacks the pass-2b/min fields"
        )
    if "queries_pass2_min" in rec:
        p2, p2b, p2m = (
            rec["queries_pass2"], rec["queries_pass2b"],
            rec["queries_pass2_min"],
        )
        assert set(p2m) == set(p2) & set(p2b)
        for q, v in p2m.items():
            assert abs(v - min(p2[q], p2b[q])) < 1e-9
        assert abs(sum(p2m.values()) - rec["value_pass2_min"]) < 0.01


def test_committed_full_artifact_exists_and_covers_registry():
    """VERDICT r11 ask #2: every full sweep must leave a committed
    per-query artifact (bench_full_r*.json) so cross-round full_total
    deltas are attributable from the repo. The newest one must parse,
    carry the three calib fields, report zero failures, and its per-query
    dict must cover the ENTIRE registry as of the artifact's round —
    today's registry minus any query registered after the sweep ran
    (none, when the sweep is rerun after registrations as the round
    workflow requires)."""
    import glob

    from lakeflow.queries import QUERIES

    files = sorted(glob.glob(os.path.join(_REPO, "bench_full_r*.json")))
    assert files, "no committed bench_full_r*.json artifact"
    rec = json.load(open(files[-1]))
    for k in ("calib", "calib_med"):
        assert rec[k] > 0, f"{files[-1]}: missing/zero {k}"
    # Dispersion's valid range INCLUDES 0 (five probe runs can round to
    # identical ms on a quiet box); only absence is a defect.
    assert rec["calib_disp"] >= 0
    assert rec["failed"] == [], f"{files[-1]}: sweep failures {rec['failed']}"
    assert rec["full_n"] == len(rec["queries"])
    assert abs(sum(rec["queries"].values()) - rec["full_total"]) < 0.01
    missing = set(QUERIES) - set(rec["queries"])
    assert not missing, (
        f"{files[-1]}: full-sweep detail missing {sorted(missing)} — rerun "
        f"`python bench.py` after registering queries so the committed "
        f"artifact covers the registry"
    )


def test_committed_pass2_artifact_carries_calib_dispersion():
    """VERDICT r11 ask #4: the calib probe alone proved too jittery to
    read (0.214↔0.170 on one HEAD); from r12 on, committed bench artifacts
    must carry the min/median/dispersion triple so a judge can apply
    BASELINE.md's decision rule mechanically."""
    import glob

    files = sorted(glob.glob(os.path.join(_REPO, "bench_pass2_r*.json")))
    assert files
    rec = json.load(open(files[-1]))
    rnd = rec.get("round", 0)
    if rnd < 12:
        return  # pre-dispersion era artifact
    assert rec["calib_med"] >= rec["calib"] > 0
    assert rec["calib_disp"] >= 0


def test_committed_bench_artifacts_carry_measuring_commit():
    """VERDICT r12 ask #2: r12's committed artifacts predated final HEAD
    by two product-code commits and the timing claim was unverifiable
    from committed files. From r13 on, both bench artifacts must stamp
    the measuring commit (``head_sha``, 40-hex) and a ``tree_dirty``
    flag. Clean provenance = head_sha present + tree_dirty False + every
    commit since head_sha touches NO product module (lakeflow/, bench.py,
    __spark_entry__.py — artifact/doc/test commits are the sanctioned
    tail); anything else must carry an explicit ``note`` naming the
    modules changed since measurement and the neutrality argument."""
    import glob
    import subprocess

    _product = ("lakeflow/", "bench.py", "__spark_entry__.py")
    for pattern in ("bench_pass2_r*.json", "bench_full_r*.json"):
        files = sorted(
            glob.glob(os.path.join(_REPO, pattern)),
            key=lambda f: int(re.search(r"_r(\d+)\.json$", f).group(1)),
        )
        assert files
        rec = json.load(open(files[-1]))
        if rec.get("round", 0) < 13:
            continue  # pre-provenance era artifact
        sha = rec.get("head_sha")
        assert sha and re.fullmatch(r"[0-9a-f]{40}", sha), (
            f"{files[-1]}: head_sha missing/malformed: {sha!r}"
        )
        if rec.get("tree_dirty") is not False:
            assert rec.get("note"), (
                f"{files[-1]}: measured on a dirty (or undetermined) tree "
                f"without a neutrality note"
            )
            continue
        # Clean tree at measure time — now pin the r12 failure mode
        # itself: product commits landing AFTER the measurement. A
        # missing/unknown sha..HEAD range (rebase, shallow clone) is
        # treated as unverifiable and needs the note too.
        diff = subprocess.run(
            ["git", "diff", "--name-only", f"{sha}..HEAD"],
            cwd=_REPO, capture_output=True, text=True, timeout=10,
        )
        if diff.returncode != 0:
            assert rec.get("note"), (
                f"{files[-1]}: head_sha {sha[:8]} unresolvable against "
                f"HEAD and no neutrality note"
            )
            continue
        touched = [
            p for p in diff.stdout.splitlines()
            if p.startswith(_product[0]) or p in _product[1:]
        ]
        assert not touched or rec.get("note"), (
            f"{files[-1]}: product modules changed since the measuring "
            f"commit {sha[:8]} with no neutrality note: {touched}"
        )


def test_provenance_dirty_flag_ignores_benchs_own_artifacts(tmp_path):
    """A re-run within a round rewrites the (tracked) pass-2 artifact
    before the full-sweep stamp is computed — the run's own outputs must
    not read as a dirty measurement tree, while any OTHER tracked
    modification still must."""
    import subprocess

    import bench

    repo = tmp_path / "r"
    repo.mkdir()

    def git(*args):
        subprocess.run(
            ["git", *args], cwd=repo, check=True, capture_output=True,
            env={**os.environ,
                 "GIT_AUTHOR_NAME": "t", "GIT_AUTHOR_EMAIL": "t@t",
                 "GIT_COMMITTER_NAME": "t", "GIT_COMMITTER_EMAIL": "t@t"},
        )

    git("init", "-q")
    (repo / "src.py").write_text("x = 1\n")
    (repo / "bench_pass2_r01.json").write_text("{}")
    (repo / "bench_full_r01.json").write_text("{}")
    git("add", "-A")
    git("commit", "-qm", "seed")

    clean = bench._provenance(root=str(repo))
    assert clean["tree_dirty"] is False and clean["head_sha"]

    # Artifact rewrites (what a mid-run stamp sees) are excluded…
    (repo / "bench_pass2_r01.json").write_text('{"value": 1}')
    (repo / "bench_full_r01.json").write_text('{"value": 2}')
    assert bench._provenance(root=str(repo))["tree_dirty"] is False

    # …but a source modification still flips the flag.
    (repo / "src.py").write_text("x = 2\n")
    assert bench._provenance(root=str(repo))["tree_dirty"] is True


def test_pass2_diff_classifier_rule_application():
    """scripts/pass2_diff.py is the mechanical form of BASELINE.md's
    warm-pass decision rule: min-era signal selection, the +-5% flat
    band, uniform-shift-is-environmental, and the per-query floor."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    try:
        import pass2_diff
    finally:
        sys.path.pop(0)

    def art(rnd, p2, p2min=None, calib=0.18, disp=0.2):
        rec = {
            "round": rnd, "queries_pass2": p2,
            "value_pass2": round(sum(p2.values()), 3),
            "calib": calib, "calib_disp": disp,
        }
        if p2min is not None:
            rec["queries_pass2_min"] = p2min
            rec["value_pass2_min"] = round(sum(p2min.values()), 3)
        return rec

    base = {"a": 1.0, "b": 2.0, "c": 4.0}

    # Flat pair -> rule 1 stops.
    out = pass2_diff.classify(art(13, base), art(14, dict(base)))
    assert "FLAT" in out and "value_pass2 " in out.splitlines()[0]

    # Min-era signal selection + tighter floor: uniform 1.3x shift with
    # min fields present -> environmental, x1.5 floor named.
    up = {q: v * 1.3 for q, v in base.items()}
    out = pass2_diff.classify(
        art(13, base, p2min=base), art(14, up, p2min=up)
    )
    assert "value_pass2_min" in out and "x1.5" in out
    assert "UNIFORM" in out and "environmental" in out

    # One query past the floor -> named as a plan-regression candidate.
    spike = dict(base, c=base["c"] * 2.0)
    out = pass2_diff.classify(
        art(13, base, p2min=base), art(14, spike, p2min=spike)
    )
    assert "candidates" in out and "c x2.00" in out

    # Mixed eras fall back to single-sample signal and the x1.8 floor:
    # the same x2.0 spike stays BELOW that floor only if < 1.8 — use a
    # x1.7 spike to pin the floor difference.
    spike17 = dict(base, c=base["c"] * 1.7)
    out = pass2_diff.classify(art(13, base), art(14, spike17, p2min=spike17))
    assert "value_pass2 " in out.splitlines()[0] and "x1.8" in out
    assert "UNIFORM" in out


def test_bench_diff_full_sweep_table():
    """scripts/bench_diff.py renders the cross-round full-sweep drift
    table: registry growth/retirement attribution, ratio ranking over
    the >=0.2s shared set, and the x1.8 single-sample floor line."""
    sys.path.insert(0, os.path.join(_REPO, "scripts"))
    try:
        import bench_diff
    finally:
        sys.path.pop(0)

    prev = {
        "round": 12, "full_total": 100.0, "full_n": 4,
        "calib": 0.18, "calib_disp": 0.2,
        "queries": {"a": 1.0, "b": 2.0, "gone": 3.0, "tiny": 0.05},
    }
    cur = {
        "round": 13, "full_total": 101.0, "full_n": 4,
        "calib": 0.19, "calib_disp": 0.25,
        "queries": {"a": 1.1, "b": 4.0, "new": 2.5, "tiny": 0.15},
    }
    out = bench_diff.diff_table(prev, cur, top_n=3)
    assert "added (1): new" in out and "removed (1): gone" in out
    # b doubled (x2.00) and must rank first; tiny (<0.2s both) excluded.
    lines = out.splitlines()
    first = next(l for l in lines if l.strip().startswith("b "))
    assert "x2.00" in first and "tiny" not in out.split("added")[0]
    # x1.8 floor: only b clears it.
    assert "above the x1.8 single-sample significance floor: b" in out
