"""Pin the driver-facing registration order invariants.

The driver verifies the first ~50 queries in registration order, so the
reorder in ``lakeflow/queries/__init__.py`` IS correctness infrastructure:
queries without a driver verdict (or with a stale one) must occupy the front
slots. These tests fail loudly if a refactor silently demotes them.
"""

from __future__ import annotations

from lakeflow.queries import (
    ORACLES,
    QUERIES,
    _REWRITTEN_SINCE_GREEN,
    _VERIFIED_R1,
    _VERIFIED_R2,
)

_VERIFIED = _VERIFIED_R1 | _VERIFIED_R2


def test_never_verified_queries_come_first():
    names = list(QUERIES)
    n_never = sum(1 for n in names if n not in _VERIFIED)
    front = names[:n_never]
    assert all(n not in _VERIFIED for n in front), (
        "a previously-verified query sits ahead of a never-verified one"
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
    names = list(QUERIES)
    r1_idx = [
        i for i, n in enumerate(names)
        if n in _VERIFIED_R1 and n not in _REWRITTEN_SINCE_GREEN
    ]
    r2_idx = [
        i for i, n in enumerate(names)
        if n in _VERIFIED_R2 and n not in _REWRITTEN_SINCE_GREEN
    ]
    assert max(r1_idx) < min(r2_idx)


def test_oracle_order_mirrors_query_order():
    q_names = [n for n in QUERIES if n in ORACLES]
    assert q_names == list(ORACLES)


def test_registry_is_complete():
    assert len(QUERIES) >= 103
    missing = _VERIFIED - set(QUERIES)
    assert not missing, f"verified names not registered: {missing}"
    assert _REWRITTEN_SINCE_GREEN <= _VERIFIED
