"""Refresh the per-query source-hash snapshot that anchors the
``_REWRITTEN_SINCE_GREEN`` guard.

A driver verdict belongs to the code that earned it. The registry keeps a
hand-curated ``_REWRITTEN_SINCE_GREEN`` set so a rewritten query regains
front-of-queue verification priority — but hand-curated means forgettable.
``scripts/query_green_hashes.json`` pins, for every query that holds a
driver verdict, a hash of the exact source (the registered callable's text
plus its oracle SQL) that was current when the snapshot was last refreshed;
``tests/test_registry_order.py::test_rewritten_queries_are_listed`` fails
whenever a verified query's current source diverges from its pinned hash
without the name appearing in ``_REWRITTEN_SINCE_GREEN``.

Run this at the start of a round, AFTER folding the latest
``CORRECTNESS_r*.json`` in (the registry derives its green sets from those
files automatically) and AFTER pruning re-greened names from
``_REWRITTEN_SINCE_GREEN``:

    python scripts/update_green_hashes.py

It refreshes hashes only for queries that (a) hold a driver verdict and
(b) are not currently listed as rewritten — a listed query keeps its OLD
hash until it re-greens, so removing it from the set without a fresh
verdict still trips the guard.

Granularity caveat: the hash covers the registered callable and its oracle
string, not helpers they call — a helper-only rewrite that changes query
behavior is caught by the local DuckDB parity replay
(``tests/test_oracle_parity.py``), not by this guard.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "query_green_hashes.json"
)


def query_hash(fn, oracle: str | None) -> str:
    src = inspect.getsource(fn)
    h = hashlib.sha256(src.encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()


def main() -> None:
    import lakeflow.queries as q

    verified = frozenset().union(*q._VERIFIED_ROUNDS.values())
    existing: dict[str, str] = {}
    if os.path.exists(SNAPSHOT):
        with open(SNAPSHOT) as f:
            existing = json.load(f)

    out: dict[str, str] = {}
    refreshed, kept, added = [], [], []
    for name, fn in q.QUERIES.items():
        if name not in verified:
            continue  # no verdict to protect yet
        cur = query_hash(fn, q.ORACLES.get(name))
        if name in q._REWRITTEN_SINCE_GREEN and name in existing:
            # Listed as rewritten: keep the OLD (green-era) hash so the
            # guard still sees the divergence until a fresh verdict lands.
            out[name] = existing[name]
            kept.append(name)
            continue
        out[name] = cur
        (refreshed if existing.get(name) not in (None, cur) else added
         if name not in existing else kept).append(name)

    with open(SNAPSHOT, "w") as f:
        json.dump(dict(sorted(out.items())), f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"snapshot: {len(out)} queries pinned -> {SNAPSHOT}")
    if refreshed:
        print(f"refreshed ({len(refreshed)}): {sorted(refreshed)}")
    if added:
        print(f"added ({len(added)}): {sorted(added)}")


if __name__ == "__main__":
    main()
