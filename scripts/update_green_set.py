"""Regenerate the driver-verified query set for the registration reorder.

The driver verifies ~50 queries per round in registration order;
``lakeflow.queries._reorder_for_driver`` puts not-yet-verified queries first
so every round converts more of them. Run this at the start of a round to
fold the latest ``CORRECTNESS_r*.json`` results into the priority ordering:

    python scripts/update_green_set.py

It prints the union of all queries with a fully green row (rows + schema +
hash, or rows-only entries with no err) across every CORRECTNESS file, as a
ready-to-paste frozenset literal, plus the list still awaiting a verdict.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    green: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("err"):
                continue
            if row.get("rows_match") and row.get("schema_match", True) and row.get(
                "hash_match", True
            ):
                green.add(name)
    from lakeflow.queries import QUERIES

    unverified = [n for n in QUERIES if n not in green]
    print(f"# {len(green)} verified across rounds; {len(unverified)} awaiting:")
    for n in unverified:
        print(f"#   {n}")
    body = ", ".join(f'"{n}"' for n in sorted(green))
    print("_DRIVER_GREEN = frozenset(")
    print(textwrap.fill("{" + body + "}", 78, initial_indent="    ",
                        subsequent_indent="    "))
    print(")")


if __name__ == "__main__":
    main()
