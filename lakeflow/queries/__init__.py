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


# Names that received a green CORRECTNESS row in round 1 (CORRECTNESS_r01.json).
# The driver verifies queries in registration order and stopped after 50 in
# round 1, leaving 46 registered queries without a verdict. Per VERDICT.md
# "Next round #1" we reorder so the unverified queries come FIRST this round:
# batch/SQL queries before the slow streaming ones (hedges a time-budgeted
# driver), previously-green queries last. The reorder is deterministic and
# does not change any query's semantics.
_ROUND1_GREEN = frozenset(
    {
        "scd1_customer_state", "scd2_customer_state", "time_travel_customer_v1",
        "sql_api_top_nations", "medallion_gold_dim", "exact_dedup_docs",
        "minhash_lsh_pairs", "ngram_jaccard_pairs", "simhash_signatures",
        "simhash_near_pairs", "cosine_topk", "lsh_bucketed_topk",
        "embedding_near_dups", "text_quality", "lang_id", "token_counts",
        "doc_fingerprints", "token_counts_pandas", "multimodal_meta",
        "ivf_topk", "frame_sample_plumbing", "jsonl_roundtrip_langs",
        "dedup_clusters", "hash_sampled_docs", "chunk_documents", "redact_pii",
        "stratified_lang_sample", "quality_filter_verdict",
        "filtered_cosine_topk", "winnow_fingerprints", "candles_15m",
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "q10_returned_items", "star_dim_customer",
        "dual_nation_lookup", "latest_event_per_user", "clean_customer",
        "incremental_orders", "customers_with_big_orders",
        "customers_without_orders", "event_value_delta", "moving_avg_1h",
        "top3_orders_per_segment", "custkeys_f_and_o", "custkeys_f_not_o",
        "order_priority_union", "rollup_status_priority",
    }
)


# Queries first registered in round 2 — verified locally but never seen by
# the driver; they rank behind the round-1 registrations still awaiting a
# driver verdict (those convert SURVEY §2 rows from untested to done).
_ROUND2_NEW = frozenset(
    {
        "ddl_roundtrip", "bm25_keyword_topk", "winnow_decontamination",
        "incremental_doc_dedup", "table_snapshots_history",
        "interpolated_hourly_value", "orc_roundtrip_langs",
    }
)


def _reorder_for_driver() -> None:
    """Reorder QUERIES and ORACLES so round-1-unverified queries are checked
    first, whichever dict the driver iterates."""
    unchecked = [
        n for n in QUERIES if n not in _ROUND1_GREEN and n not in _ROUND2_NEW
    ]
    # Within the unchecked block, run cheap batch queries before streaming
    # end-to-end queries (micro-batch machinery dominates their wall time).
    slow = [n for n in unchecked if n.startswith(("stream_", "pysource_"))]
    fast = [n for n in unchecked if n not in slow]
    new = [n for n in QUERIES if n in _ROUND2_NEW]
    green = [n for n in QUERIES if n in _ROUND1_GREEN]
    ordered = fast + slow + new + green
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_oracles)


_load_all()
_reorder_for_driver()
