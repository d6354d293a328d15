"""Verification-freshness report for the driver-facing query registry.

The registry derives its per-round green sets DIRECTLY from the committed
``CORRECTNESS_r*.json`` files at import time (``lakeflow/queries/__init__.py``
— VERDICT r7 ask #7), so there is no literal to regenerate anymore. This
script now reports the state that ordering produces:

    python scripts/update_green_set.py

* per-round green counts as parsed by the registry itself,
* queries with NO driver verdict yet (they hold front-of-window slots),
* the staleness histogram (how many queries' LATEST verdict is from each
  round) and the names the next ~50-slot window will re-grade,
* the ``_REWRITTEN_SINCE_GREEN`` roster (audit it whenever a query's
  implementation or oracle changes after its green round — the source-hash
  guard in tests/test_registry_order.py enforces the listing; refresh the
  snapshot with ``python scripts/update_green_hashes.py``).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import lakeflow.queries as q

    rounds = q._VERIFIED_ROUNDS
    latest: dict[str, int] = {}
    for rnd in sorted(rounds):
        for n in rounds[rnd]:
            latest[n] = rnd
    names = list(q.QUERIES)

    print(f"registered queries: {len(names)} ({len(q.ORACLES)} with oracles)")
    for rnd in sorted(rounds):
        print(f"  round {rnd}: {len(rounds[rnd])} green")
    never = [n for n in names if n not in latest]
    print(f"never driver-verified: {len(never)}")
    for n in never:
        print(f"  {n}")
    print("latest-verdict histogram:",
          dict(sorted(Counter(latest[n] for n in names if n in latest).items())))
    print(f"rewritten since green: {sorted(q._REWRITTEN_SINCE_GREEN) or '(none)'}")
    helper_change = q._helper_change_rounds()
    helper_stale = [
        n for n in names
        if n in latest and helper_change.get(n, 0) > latest[n]
    ]
    print(
        f"helper-stale greens (a transitive dep module changed after the "
        f"verdict; they lead their round cohort): {len(helper_stale)}"
    )
    window = names[:50]
    print("next 50-slot window re-grades latest-verdict rounds:",
          dict(sorted(Counter(latest.get(n, 0) for n in window).items())),
          "(0 = no verdict yet)")


if __name__ == "__main__":
    main()
