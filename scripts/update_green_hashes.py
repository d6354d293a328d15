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

Helper granularity (VERDICT r9 ask #2): the per-query hash covers the
registered callable and its oracle string. Deep helpers the callable pulls
in (tables.py, streaming/sinks.py, operator modules...) are tracked by the
HELPER LEDGER this script also maintains (``scripts/helper_ledger.json``):
for every query it records the transitive set of lakeflow module FILES the
callable's imports reach, and for every such module a source hash plus the
round at which the module last changed. The registry re-hashes those
modules at import; a green whose dependency changed in a round AFTER its
verdict is "helper-stale" and re-verifies ahead of fresh greens of the
same verdict round (cohort tie-break — deliberately NOT absolute priority,
because one tables.py edit touches half the registry and would otherwise
flood the ~50-slot window and stall the age-based rotation the
staleness-debt gate enforces). Behavioral breakage from helper rewrites is
still caught immediately by the local DuckDB parity replay
(``tests/test_oracle_parity.py``); the ledger closes the FRESHNESS blind
spot, making driver-verdict currency reflect helper churn.
"""

from __future__ import annotations

import ast
import hashlib
import inspect
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SNAPSHOT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "query_green_hashes.json"
)
LEDGER = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "helper_ledger.json"
)
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The registry file itself is bookkeeping, not query behavior — and every
# query module imports it (for ``register``), so including it would make
# every query depend on every other's registration churn.
_DEP_EXCLUDE = {"lakeflow/queries/__init__.py"}


def query_hash(fn, oracle: str | None) -> str:
    src = inspect.getsource(fn)
    h = hashlib.sha256(src.encode())
    h.update(b"\x00")
    h.update((oracle or "").encode())
    return h.hexdigest()


def _module_file(modname: str) -> str | None:
    """Repo-relative file for a dotted lakeflow module name, None if the
    name is not a module (e.g. a function pulled via ``from m import f``)."""
    rel = modname.replace(".", "/")
    for cand in (f"{rel}.py", f"{rel}/__init__.py"):
        if os.path.exists(os.path.join(REPO_ROOT, cand)):
            return cand
    return None


def _lakeflow_import_files(tree: ast.AST) -> set[str]:
    """Every lakeflow module FILE an AST imports, at any nesting depth
    (queries import locally inside the callable by style)."""
    names: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom):
            if node.module and node.module.startswith("lakeflow"):
                names.add(node.module)
                # ``from lakeflow.streaming import sinks`` names a module
                # in the alias list, not in node.module.
                names.update(f"{node.module}.{a.name}" for a in node.names)
        elif isinstance(node, ast.Import):
            names.update(
                a.name for a in node.names if a.name.startswith("lakeflow")
            )
    return {f for n in names if (f := _module_file(n)) is not None}


def query_dep_files(fn) -> list[str]:
    """Transitive lakeflow module files a query callable can reach: its own
    (possibly function-local) imports, its defining module (same-module
    helpers like ``table_path`` live outside the callable's source hash),
    and the closure over those modules' imports."""
    seeds = _lakeflow_import_files(
        ast.parse(textwrap.dedent(inspect.getsource(fn)))
    )
    own = _module_file(fn.__module__)
    if own is not None:
        seeds.add(own)
    seen: set[str] = set()
    queue = sorted(seeds - _DEP_EXCLUDE)
    while queue:
        f = queue.pop()
        if f in seen:
            continue
        seen.add(f)
        with open(os.path.join(REPO_ROOT, f)) as fh:
            sub = _lakeflow_import_files(ast.parse(fh.read()))
        queue.extend(sorted(sub - seen - _DEP_EXCLUDE))
    return sorted(seen)


def module_source_hash(relpath: str) -> str | None:
    try:
        with open(os.path.join(REPO_ROOT, relpath), "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()
    except OSError:
        return None


def refresh_ledger(queries: dict, current_round: int) -> dict:
    """Rebuild deps for every registered query and roll the per-module
    change rounds forward: a module whose source hash moved since the last
    refresh changed during a round no existing verdict covers, so it is
    stamped with ``current_round`` (conservative: refresh runs at round
    start, before that round's driver verdicts exist)."""
    prev_modules: dict[str, dict] = {}
    if os.path.exists(LEDGER):
        with open(LEDGER) as fh:
            prev_modules = json.load(fh).get("modules", {})
    deps = {name: query_dep_files(fn) for name, fn in queries.items()}
    modules: dict[str, dict] = {}
    for rel in sorted({f for fs in deps.values() for f in fs}):
        cur = module_source_hash(rel)
        prev = prev_modules.get(rel)
        if prev is not None and prev["hash"] == cur:
            modules[rel] = prev
        else:
            modules[rel] = {"hash": cur, "round": current_round}
    return {"modules": modules, "deps": deps}


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

    current_round = (max(q._VERIFIED_ROUNDS) + 1) if q._VERIFIED_ROUNDS else 1
    ledger = refresh_ledger(q.QUERIES, current_round)
    churned = [
        rel for rel, info in ledger["modules"].items()
        if info["round"] == current_round
    ]
    with open(LEDGER, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"ledger: {len(ledger['modules'])} modules / "
        f"{len(ledger['deps'])} queries -> {LEDGER}"
    )
    if churned:
        print(f"churned this round ({len(churned)}): {churned}")


if __name__ == "__main__":
    main()
