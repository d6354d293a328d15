"""Regenerate the driver-verified query sets for the registration reorder.

The driver verifies ~50 queries per round in registration order;
``lakeflow.queries._reorder_for_driver`` puts not-yet-verified queries first
so every round converts more of them. Run this at the start of a round to
fold the latest ``CORRECTNESS_r*.json`` results into the priority ordering:

    python scripts/update_green_set.py

For each ``CORRECTNESS_rNN.json`` it prints a ready-to-paste
``_VERIFIED_RNN = frozenset(...)`` literal — the exact symbols
``lakeflow/queries/__init__.py`` consumes — plus the queries still awaiting
a verdict. A row counts as verified when rows+schema+hash all matched, or
when it is a by-design rows-only query (``err == "no_oracle"`` with a
non-negative row count); other errors leave the query unverified.

It also reminds you to audit ``_REWRITTEN_SINCE_GREEN``: a green verdict
belongs to the code that earned it, so any query whose implementation or
oracle changed after its verified round must be listed there to regain
front-of-queue priority (use ``git log --since`` on the defining module).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import textwrap

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _is_verified(row: dict) -> bool:
    if row.get("err") == "no_oracle":
        # Rows-only query by design: the driver's weaker check ran and the
        # query produced a result. Re-running it buys no new information.
        return row.get("spark_rows") is not None and row["spark_rows"] >= 0
    if row.get("err"):
        return False
    return bool(
        row.get("rows_match")
        and row.get("schema_match", True)
        and row.get("hash_match", True)
    )


def main() -> None:
    all_green: set[str] = set()
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        round_no = re.search(r"r(\d+)", os.path.basename(path)).group(1)
        green = {
            name
            for name, row in json.load(open(path)).items()
            if _is_verified(row)
        }
        all_green |= green
        body = ", ".join(f'"{n}"' for n in sorted(green))
        print(f"_VERIFIED_R{int(round_no)} = frozenset(")
        print(
            textwrap.fill(
                "{" + body + "}", 78, initial_indent="    ",
                subsequent_indent="    ",
            )
        )
        print(")")
        print()

    from lakeflow.queries import QUERIES

    unverified = [n for n in QUERIES if n not in all_green]
    print(f"# {len(all_green)} verified across rounds; {len(unverified)} awaiting:")
    for n in unverified:
        print(f"#   {n}")
    print(
        "# Audit _REWRITTEN_SINCE_GREEN by hand: any query whose module "
        "changed after\n# its verified round belongs there too."
    )


if __name__ == "__main__":
    main()
