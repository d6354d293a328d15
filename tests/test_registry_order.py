"""Pin the driver-facing registration order invariants.

The driver verifies the first ~50 queries in registration order, so the
reorder in ``lakeflow/queries/__init__.py`` IS correctness infrastructure:
queries without a driver verdict (or with a stale one) must occupy the front
slots. These tests fail loudly if a refactor silently demotes them.
"""

from __future__ import annotations

import re

import lakeflow.queries as _q
from lakeflow.queries import ORACLES, QUERIES, _REWRITTEN_SINCE_GREEN

# Collect every _VERIFIED_R<N> the registry defines, in round order, so a
# new round's fold-in can never silently diverge from these invariants.
_ROUNDS = sorted(
    (int(m.group(1)), getattr(_q, name))
    for name in dir(_q)
    if (m := re.fullmatch(r"_VERIFIED_R(\d+)", name))
)
assert len(_ROUNDS) >= 5, "expected at least rounds 1-5 folded in"

_VERIFIED = frozenset().union(*(names for _rnd, names in _ROUNDS))

_LATEST_GREEN: dict[str, int] = {}
for _rnd, _names in _ROUNDS:
    for _n in _names:
        _LATEST_GREEN[_n] = _rnd


def test_stale_then_never_verified_lead_the_order():
    """Stale greens (rewritten since their verdict — several r4 verdict
    asks hinge on their re-green) must occupy the very front so they never
    fall off the driver's ~50-slot window however many new queries a round
    registers; the never-verified block follows, before any stable green."""
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


def test_rewritten_since_green_precede_stable_greens():
    names = list(QUERIES)
    stale_idx = [names.index(n) for n in _REWRITTEN_SINCE_GREEN if n in names]
    stable_idx = [
        i for i, n in enumerate(names)
        if n in _VERIFIED and n not in _REWRITTEN_SINCE_GREEN
    ]
    assert stale_idx and stable_idx
    assert max(stale_idx) < min(stable_idx), (
        "a stale-green (rewritten) query ranks behind a stable-green one"
    )


def test_oldest_verdicts_reverified_before_newest():
    """Stable greens are ordered by the round of their LATEST verdict,
    oldest first — re-verification pressure goes where evidence is stalest."""
    names = list(QUERIES)
    stable = [
        (i, _LATEST_GREEN[n]) for i, n in enumerate(names)
        if n in _VERIFIED and n not in _REWRITTEN_SINCE_GREEN
    ]
    rounds_in_order = [r for _, r in sorted(stable)]
    assert rounds_in_order == sorted(rounds_in_order)


def test_stale_set_covers_round7_rewrites():
    """Every query whose implementation or oracle changed in round 7 must
    hold a front-of-queue slot: the approx-distinct verdict-row rewrite
    (VERDICT r6 ask #5)."""
    assert {"approx_distinct_users"} <= _REWRITTEN_SINCE_GREEN


def test_carry_block_precedes_new_never_verified():
    """VERDICT r6 #1/#3: the 42 queries that entered r7 with no driver
    verdict must fill the window before anything registered new in r7."""
    names = list(QUERIES)
    carry_idx = [
        i for i, n in enumerate(names) if n in _q._NEVER_VERIFIED_CARRY
    ]
    new_idx = [
        i for i, n in enumerate(names)
        if n not in _VERIFIED and n not in _q._NEVER_VERIFIED_CARRY
    ]
    assert len(carry_idx) == 42
    if new_idx:
        assert max(carry_idx) < min(new_idx), (
            "a query registered new in r7 displaced the carry block"
        )
    # 1 stale + 42 carry fit inside the ~50-slot window with room to
    # re-green the oldest stable verdicts.
    n_stale = len([n for n in _REWRITTEN_SINCE_GREEN if n in names])
    assert n_stale + len(carry_idx) <= 50


def test_oracle_order_mirrors_query_order():
    q_names = [n for n in QUERIES if n in ORACLES]
    assert q_names == list(ORACLES)


def test_registry_is_complete():
    assert len(QUERIES) >= 103
    missing = _VERIFIED - set(QUERIES)
    assert not missing, f"verified names not registered: {missing}"
    assert _REWRITTEN_SINCE_GREEN <= _VERIFIED
