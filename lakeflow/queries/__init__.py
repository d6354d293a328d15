"""Driver-facing query registry.

Each registered query is a ``(spark, sf_dir) -> DataFrame`` callable plus (when
SQL-expressible) a DuckDB oracle SQL string over the same fixture tables.
``__spark_entry__.py`` re-exports these as ``queries()`` / ``oracle_sql()``.

Contract reminders (BASELINE.md, FIXTURES.md):
* alias every computed column identically in Spark and oracle SQL;
* timestamps leave query outputs as formatted strings (engine-neutral);
* float aggregates are rounded to a fixed scale on both sides so
  parallel-summation ulp noise cannot flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from lakeflow.queries import (  # noqa: F401
        medallion,
        northstar,
        relational,
        streaming,
        timeseries,
    )


_load_all()
