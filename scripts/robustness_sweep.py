#!/usr/bin/env python
"""Oracle-parity robustness sweeps: the full registry re-verified under
execution-environment variants that must never change results.

Variants (r13 continuation session, all measured clean — COVERAGE.md):
  parts1   shuffle_partitions=1 on local[1]   (serial extreme)
  parts7   shuffle_partitions=7 on local[3]   (pathological odd count)
  aqe-off  spark.sql.adaptive.enabled=false   (no runtime re-planning)
  default  the test suite's 4/local[4]        (baseline)

Any mismatch means a query's result depends on task count, scheduling
order, parallel-reduction grouping, or AQE's physical-planning choices —
the determinism-discipline failure class (tie-breaks, limits without
order, first/last aggregates). The sf0.1 scale sweep is separate:
``LAKEFLOW_TEST_SF_DIR=/root/testdata/sf0.1 pytest tests/test_oracle_parity.py``.

Usage:
  python scripts/robustness_sweep.py [variant ...] [--sf DIR] [--queries a,b]

Defaults: variants parts1 parts7 aqe-off at /root/testdata/sf0.01.
Exit code 1 if any leg has mismatches. ~6 min per leg at sf0.01 idle.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS: dict[str, tuple[str, int, dict]] = {
    "parts1": ("local[1]", 1, {}),
    "parts7": ("local[3]", 7, {}),
    "aqe-off": ("local[4]", 4, {"spark.sql.adaptive.enabled": "false"}),
    # Interpreted evaluation instead of whole-stage-generated code — the
    # two execution paths must agree expression by expression.
    "codegen-off": (
        "local[4]", 4, {"spark.sql.codegen.wholeStage": "false"}
    ),
    # Non-ANSI arithmetic/cast semantics — no registered query may rely
    # on ANSI-only behavior (overflow errors, strict casts) for its
    # RESULT; both modes must produce identical rows.
    "ansi-off": ("local[4]", 4, {"spark.sql.ansi.enabled": "false"}),
    # Pandas-UDF/grouped-map paths through the pickle fallback instead
    # of Arrow batches — serialization format must not change results.
    "arrow-off": (
        "local[4]", 4,
        {"spark.sql.execution.arrow.pyspark.enabled": "false"},
    ),
    "default": ("local[4]", 4, {}),
}


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, bool):
        return int(v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows), key=repr
    )


def run_variant(
    name: str, sf_dir: str, only: list[str] | None = None
) -> list[str]:
    """Run one variant leg; returns the mismatch list (empty = clean)."""
    import duckdb

    from lakeflow.catalog import TABLES, table_path
    from lakeflow.queries import ORACLES, QUERIES
    from lakeflow.session import get_session

    master, parts, conf = VARIANTS[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    spark = get_session(
        f"robustness-{name}",
        master=master,
        shuffle_partitions=parts,
        extra_conf={"spark.driver.memory": "4g", **conf},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in conf.items():
        assert spark.conf.get(k) == v, f"variant conf {k} did not stick"
    bad: list[str] = []
    names = only if only is not None else sorted(QUERIES)
    for qname in names:
        try:
            df = QUERIES[qname](spark, sf_dir)
            rows = [tuple(r) for r in df.collect()]
            if qname in ORACLES:
                res = con.execute(ORACLES[qname])
                dcols = [d[0] for d in res.description]
                if _norm_rows(df.columns, rows) != _norm_rows(
                    dcols, res.fetchall()
                ):
                    bad.append(qname)
        except Exception as exc:  # a broken query must not sink the leg
            bad.append(f"{qname} (ERROR {type(exc).__name__})")
    spark.stop()
    return bad


def main() -> int:
    from lakeflow.scratch import use_process_scratch

    use_process_scratch()
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    only = None
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    if "--queries" in args:
        i = args.index("--queries")
        only = args[i + 1].split(",")
        del args[i : i + 2]
    variants = args or ["parts1", "parts7", "aqe-off"]
    failed = False
    for v in variants:
        bad = run_variant(v, sf_dir, only)
        n = len(only) if only is not None else "all"
        print(f"{v} @ {sf_dir} ({n}): mismatches: {bad or 'NONE'}", flush=True)
        failed = failed or bool(bad)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
