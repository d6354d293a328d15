"""Engine-neutral rounding.

Spark's ``round`` rounds the shortest decimal representation HALF_UP via
BigDecimal; DuckDB rounds in binary floating point. On exact ties at the
rounding digit (common when inputs are themselves rounded values, or ratios
with power-of-two denominators) the two disagree by 1 ulp of the target scale.

``rnd`` therefore defines rounding as ``floor(x * 10^d + 0.5) / 10^d`` — every
step is an IEEE-exact double op, so any engine evaluating the same formula on
the same double produces the identical result. ``sql_rnd`` emits the matching
SQL text for oracle queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rnd(c: Column | str, d: int = 2) -> Column:
    """Deterministic half-up rounding to ``d`` decimals (see module doc)."""
    c = F.col(c) if isinstance(c, str) else c
    s = float(10**d)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def sql_rnd(expr: str, d: int = 2) -> str:
    """SQL twin of ``rnd`` for oracle queries."""
    s = float(10**d)
    return f"(floor(({expr}) * {s} + 0.5) / {s})"
