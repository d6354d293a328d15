"""Pin the driver-facing registration order invariants.

The driver verifies the first ~50 queries in registration order, so the
reorder in ``lakeflow/queries/__init__.py`` IS correctness infrastructure:
queries without a driver verdict (or with a stale one) must occupy the front
slots. These tests fail loudly if a refactor silently demotes them — and the
source-hash guard fails if a query is rewritten after its green verdict
without being listed in ``_REWRITTEN_SINCE_GREEN`` (VERDICT r7 ask #3).
"""

from __future__ import annotations

import json
import os
import re

import lakeflow.queries as _q
from lakeflow.queries import ORACLES, QUERIES, _REWRITTEN_SINCE_GREEN

# Collect every _VERIFIED_R<N> the registry exposes, in round order, so a
# new round's fold-in can never silently diverge from these invariants.
_ROUNDS = sorted(
    (int(m.group(1)), getattr(_q, name))
    for name in dir(_q)
    if (m := re.fullmatch(r"_VERIFIED_R(\d+)", name))
)
assert len(_ROUNDS) >= 7, "expected at least rounds 1-7 folded in"

_VERIFIED = frozenset().union(*(names for _rnd, names in _ROUNDS))

_LATEST_GREEN: dict[str, int] = {}
for _rnd, _names in _ROUNDS:
    for _n in _names:
        _LATEST_GREEN[_n] = _rnd


def test_verified_sets_derive_from_correctness_files():
    """The per-round green sets are parsed from the committed
    CORRECTNESS_r*.json files at import time (VERDICT r7 ask #7), so the
    module attributes must agree with an independent re-parse."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import glob

    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    assert len(files) == len(_ROUNDS)
    for path, (rnd, names) in zip(files, _ROUNDS):
        assert f"r{rnd:02d}" in os.path.basename(path)
        rows = json.load(open(path))
        green = {n for n, r in rows.items() if _q._row_verified(r)}
        assert green == names, f"round {rnd} set diverged from {path}"


def test_stale_then_never_verified_lead_the_order():
    """Stale greens (rewritten since their verdict) must occupy the very
    front so they never fall off the driver's ~50-slot window however many
    new queries a round registers; the never-verified block follows,
    before any stable green."""
    names = list(QUERIES)
    n_stale = len([n for n in _REWRITTEN_SINCE_GREEN if n in names])
    n_never = sum(1 for n in names if n not in _VERIFIED)
    front = names[:n_stale]
    assert all(n in _REWRITTEN_SINCE_GREEN for n in front), (
        "a non-stale query sits inside the stale-first block"
    )
    mid = names[n_stale : n_stale + n_never]
    assert all(n not in _VERIFIED for n in mid), (
        "a previously-verified query sits inside the never-verified block"
    )
    # Stale + new must leave most of the ~50-slot window for rotating the
    # oldest stable greens (VERDICT r7 ask #1 capped new registrations).
    assert n_stale + n_never <= 10


def test_stalest_greens_lead_the_window():
    """VERDICT r8 ask #1 (replacing the self-expiring r8-era census test):
    the stable-green block must open with exactly the queries whose latest
    verdict is the OLDEST round present, and that block must start right
    after the stale+never front — all counts derived from the same
    CORRECTNESS files the registry parses, never hard-coded, so a new
    driver results file can never redden this test."""
    names = list(QUERIES)
    stable = [
        (i, n) for i, n in enumerate(names)
        if n in _VERIFIED and n not in _REWRITTEN_SINCE_GREEN
    ]
    assert stable, "registry has no stable greens — CORRECTNESS files missing?"
    rounds_present = sorted({_LATEST_GREEN[n] for _, n in stable})
    oldest = rounds_present[0]
    oldest_idx = [i for i, n in stable if _LATEST_GREEN[n] == oldest]
    newer_idx = [i for i, n in stable if _LATEST_GREEN[n] != oldest]
    if newer_idx:
        assert max(oldest_idx) < min(newer_idx), (
            f"a round-{oldest} green sits behind a fresher one"
        )
    n_front = len([n for n in _REWRITTEN_SINCE_GREEN if n in names]) + sum(
        1 for n in names if n not in _VERIFIED
    )
    assert min(i for i, _ in stable) == n_front, (
        "stable-green block does not start immediately after the "
        "stale+never-verified front"
    )


def test_staleness_debt_is_bounded():
    """VERDICT r8 ask #7: registry freshness as a gate, not a chore. With a
    ~50-slot window per round rotating the stalest greens first, steady
    state leaves ~len(QUERIES) - 4*50 queries whose latest verdict is >=4
    rounds old (~40 for a 239-query registry). Fail if that debt
    re-accumulates past 60 — roughly one skipped rotation's worth — so it
    can never silently grow back once the r9 rotation clears the r3/r4
    backlog."""
    if not _LATEST_GREEN:
        return
    current = max(_LATEST_GREEN.values())
    stale = [
        n for n in QUERIES
        if n in _LATEST_GREEN and current - _LATEST_GREEN[n] >= 4
    ]
    assert len(stale) <= 60, (
        f"{len(stale)} queries' latest verdict is >=4 rounds old "
        f"(gate: 60) — the per-round rotation has stalled: {sorted(stale)[:10]}..."
    )


def test_oldest_verdicts_reverified_before_newest():
    """Stable greens are ordered by the round of their LATEST verdict,
    oldest first — re-verification pressure goes where evidence is
    stalest."""
    names = list(QUERIES)
    stable = [
        (i, _LATEST_GREEN[n]) for i, n in enumerate(names)
        if n in _VERIFIED and n not in _REWRITTEN_SINCE_GREEN
    ]
    rounds_in_order = [r for _, r in sorted(stable)]
    assert rounds_in_order == sorted(rounds_in_order)


def test_rewritten_queries_are_listed():
    """Source-hash guard (VERDICT r7 ask #3): every verified query whose
    registered callable or oracle SQL diverged from the snapshot taken at
    its last green verdict must appear in ``_REWRITTEN_SINCE_GREEN`` —
    and every listed name must genuinely differ, so the set cannot rot.
    Refresh the snapshot with ``python scripts/update_green_hashes.py``
    after folding a round's CORRECTNESS results in."""
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    try:
        from update_green_hashes import SNAPSHOT, query_hash
    finally:
        sys.path.pop(0)
    pinned = json.load(open(SNAPSHOT))
    unlisted_rewrites = []
    for name in QUERIES:
        if name not in _VERIFIED or name not in pinned:
            continue
        cur = query_hash(QUERIES[name], ORACLES.get(name))
        if cur != pinned[name] and name not in _REWRITTEN_SINCE_GREEN:
            unlisted_rewrites.append(name)
    assert not unlisted_rewrites, (
        f"rewritten since their green verdict but not listed in "
        f"_REWRITTEN_SINCE_GREEN: {sorted(unlisted_rewrites)}"
    )
    # A listed name must carry EVIDENCE of the rewrite so the set cannot
    # rot: either its callable/oracle hash diverged from the green-era
    # snapshot, or (r14) its transitive HELPER modules changed after its
    # verdict round per the ledger — the r13 optimization round rewrote
    # operator internals (densify/exact-substring/sign_bucket/winnow)
    # under unchanged callables, and those rewrites front-load through
    # this set too. Once the driver re-greens a listed name, neither arm
    # holds and the assert forces the prune.
    helper_change = _q._helper_change_rounds()
    for name in _REWRITTEN_SINCE_GREEN:
        if name in pinned:
            diverged = (
                query_hash(QUERIES[name], ORACLES.get(name)) != pinned[name]
            )
            helper_stale = helper_change.get(name, 0) > _LATEST_GREEN.get(
                name, 0
            )
            assert diverged or helper_stale, (
                f"{name} is listed as rewritten but its source matches the "
                f"green-era snapshot and no helper module changed since its "
                f"verdict — prune the set or refresh the snapshot"
            )


def test_oracle_order_mirrors_query_order():
    q_names = [n for n in QUERIES if n in ORACLES]
    assert q_names == list(ORACLES)


def test_registry_is_complete():
    assert len(QUERIES) >= 238
    # Historically-verified names may be absent ONLY when explicitly
    # retired through the SCALE.md §10 ledger (which also pins that their
    # parity coverage moved into the pytest suite — see
    # tests/test_retired_queries.py).
    with open(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "retired_queries.json",
        )
    ) as f:
        retired = set(json.load(f)["retired"])
    missing = _VERIFIED - set(QUERIES) - retired
    assert not missing, (
        f"verified names neither registered nor in the retirement ledger: "
        f"{missing}"
    )
    assert _REWRITTEN_SINCE_GREEN <= _VERIFIED


def test_corrupt_correctness_file_warns_loudly(tmp_path, monkeypatch):
    """ADVICE r8: a CORRECTNESS file that exists but fails to parse must
    not be SILENTLY skipped — a dropped round would reshuffle the
    driver-facing registration order with no visible cause."""
    import shutil
    import warnings

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in ["CORRECTNESS_r01.json"]:
        shutil.copy(os.path.join(root, f), tmp_path / f)
    (tmp_path / "CORRECTNESS_r02.json").write_text("{ half-written")
    monkeypatch.setattr(_q, "_REPO_ROOT", str(tmp_path))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        rounds = _q._load_verified_rounds()
    assert set(rounds) == {1}  # the good round still loads
    loud = [w for w in caught if "CORRECTNESS_r02.json" in str(w.message)]
    assert loud and issubclass(loud[0].category, RuntimeWarning)


def _load_ledger():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "scripts", "helper_ledger.json")) as f:
        return json.load(f)


def test_helper_ledger_covers_the_registry():
    """VERDICT r9 ask #2: the helper ledger must pin a (hash, round) for
    every module any registered query transitively depends on, and carry
    a dep entry for every query — otherwise helper churn under a green
    goes back to being invisible."""
    ledger = _load_ledger()
    missing = set(QUERIES) - set(ledger["deps"])
    assert not missing, f"queries without ledger deps: {sorted(missing)[:5]}"
    dep_files = {f for fs in ledger["deps"].values() for f in fs}
    unpinned = dep_files - set(ledger["modules"])
    assert not unpinned, f"dep modules without a pin: {sorted(unpinned)}"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for rel in dep_files:
        assert os.path.exists(os.path.join(root, rel)), f"ghost dep {rel}"
    # Spot-check transitivity: a streaming index query must reach both the
    # operator module and the sink machinery it rides on.
    bm25 = set(ledger["deps"]["stream_bm25_index"])
    assert {"lakeflow/operators/text.py", "lakeflow/streaming/sinks.py"} <= bm25
    # The registry file itself is excluded (it would make every query
    # depend on every other's registration churn).
    assert "lakeflow/queries/__init__.py" not in dep_files


def test_helper_change_rounds_flag_live_and_pinned_churn():
    """Unit-test the staleness computation against a doctored ledger: a
    pinned-hash mismatch (live edit this round) and a pinned later round
    both mark dependents; matching pins do not."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import hashlib

    rel = "lakeflow/operators/transforms.py"
    live = hashlib.sha256(
        open(os.path.join(root, rel), "rb").read()
    ).hexdigest()
    current = max(r for r, _ in _ROUNDS) + 1
    ledger = {
        "modules": {
            rel: {"hash": live, "round": 3},
            "lakeflow/tables.py": {"hash": "not-the-live-hash", "round": 0},
        },
        "deps": {
            "a": [rel],
            "b": [rel, "lakeflow/tables.py"],
            "c": [],
        },
    }
    got = _q._helper_change_rounds(ledger)
    assert got == {"a": 3, "b": current, "c": 0}


def test_helper_stale_greens_lead_their_cohort():
    """Stable greens stay ordered by verdict round (rotation invariant),
    and WITHIN each same-round cohort every helper-stale green precedes
    every fresh one — driver-verdict freshness now reflects helper churn
    without letting one hot module flood the whole window."""
    helper_change = _q._helper_change_rounds()
    names = list(QUERIES)
    stable = [
        n for n in names
        if n in _VERIFIED and n not in _REWRITTEN_SINCE_GREEN
    ]
    seen_fresh_in_round: dict[int, bool] = {}
    for n in stable:
        rnd = _LATEST_GREEN[n]
        stale = helper_change.get(n, 0) > rnd
        if stale:
            assert not seen_fresh_in_round.get(rnd, False), (
                f"helper-stale green {n} (r{rnd}) sits behind a fresh "
                f"green of the same cohort"
            )
        else:
            seen_fresh_in_round[rnd] = True
