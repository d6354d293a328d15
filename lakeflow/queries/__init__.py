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


# Driver-verified queries by round (CORRECTNESS_r01.json / CORRECTNESS_r02.json;
# regenerate with ``python scripts/update_green_set.py``). A row counts as
# verified when rows+schema+hash all matched, or when it is a by-design
# rows-only query (``err == "no_oracle"`` with a non-negative row count).
# Since r7 every registered query has a DuckDB oracle — approx_distinct_users
# (the last rows-only carve-out) now emits a hash-checked tolerance verdict.
_VERIFIED_R1 = frozenset(
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

_VERIFIED_R2 = frozenset(
    {
        "acctbal_distribution_ranks", "approx_distinct_users",
        "asof_purchase_view", "banded_price_match", "bm25_keyword_topk",
        "cube_flag_status", "ddl_roundtrip", "distinct_parts_per_flag",
        "fuzzy_name_pairs", "gap_sessions_batch", "grouping_sets_status_flag",
        "monthly_revenue", "parse_event_props", "pivot_status_by_priority",
        "price_percentiles", "pysource_tick_candles", "q11_important_parts",
        "q12_priority_shipping", "q13_order_count_distribution",
        "q14_promo_revenue", "q15_top_supplier", "q16_supplier_part_counts",
        "q17_small_qty_revenue", "q18_large_volume_customers",
        "q19_disjunctive_revenue", "q20_bulk_suppliers", "q21_waiting_suppliers",
        "q22_idle_rich_customers", "q2_cheapest_supplier", "q4_order_priority",
        "q7_nation_volume", "q8_market_share", "q9_product_profit",
        "recursive_month_spine", "session_windows_30m",
        "sliding_windows_30m15m", "stats_by_flag", "stream_candles_15m",
        "stream_event_dedup", "stream_gap_sessions", "stream_session_windows",
        "stream_static_enrich", "stream_stream_view_to_purchase",
        "table_snapshots_history", "unpivot_priority_metrics",
        "user_event_type_sets", "user_value_trend", "variant_props_stats",
        "weighted_avg_price_udaf", "winnow_decontamination",
    }
)

_VERIFIED_R3 = frozenset(
    {
        "candles_15m", "chunk_documents", "clean_customer", "cosine_topk",
        "customers_with_big_orders", "customers_without_orders",
        "dedup_clusters", "doc_fingerprints", "dual_nation_lookup",
        "embedding_near_dups", "event_value_delta", "exact_dedup_docs",
        "filtered_cosine_topk", "frame_sample_plumbing", "fuzzy_name_pairs",
        "hash_sampled_docs", "incremental_doc_dedup", "incremental_orders",
        "interpolated_hourly_value", "ivf_topk", "jsonl_roundtrip_langs",
        "lang_id", "latest_event_per_user", "lsh_bucketed_topk",
        "lsh_multitable_topk", "medallion_gold_dim", "minhash_lsh_pairs",
        "minhash_lsh_salted_pairs", "multimodal_meta", "ngram_jaccard_pairs",
        "orc_roundtrip_langs", "q10_returned_items", "q1_pricing_summary",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_forecast_revenue", "quality_filter_verdict", "redact_pii",
        "scd1_customer_state", "scd2_customer_state", "simhash_near_pairs",
        "simhash_signatures", "sql_api_top_nations", "star_dim_customer",
        "stratified_lang_sample", "text_quality", "time_travel_customer_v1",
        "token_counts", "token_counts_pandas", "winnow_fingerprints",
    }
)

_VERIFIED_R4 = frozenset(
    {
        "acctbal_distribution_ranks", "approx_distinct_users",
        "banded_price_match", "bm25_keyword_topk", "cdc_orders_state",
        "cube_flag_status", "custkeys_f_and_o", "custkeys_f_not_o",
        "ddl_roundtrip", "dedup_survivors", "distinct_parts_per_flag",
        "doc_repetition_signals", "interpolated_hourly_value",
        "monthly_revenue", "moving_avg_1h", "order_priority_union",
        "pack_sequences", "parse_event_props", "pivot_status_by_priority",
        "price_percentiles", "q11_important_parts",
        "q13_order_count_distribution", "q14_promo_revenue",
        "q15_top_supplier", "q17_small_qty_revenue",
        "q18_large_volume_customers", "q19_disjunctive_revenue",
        "q22_idle_rich_customers", "q4_order_priority", "q7_nation_volume",
        "q8_market_share", "q9_product_profit", "rollup_status_priority",
        "salted_event_type_stats", "source_mix_report", "stats_by_flag",
        "stream_candles_15m", "stream_event_dedup", "stream_gap_sessions",
        "stream_session_windows", "stream_static_enrich",
        "stream_stream_view_to_purchase", "table_snapshots_history",
        "top3_orders_per_segment", "top_bigram_phrases",
        "unigram_logprob_scores", "unpivot_priority_metrics",
        "user_event_type_sets", "winnow_decontamination",
        "zorder_pruned_scan",
    }
)

_VERIFIED_R5 = frozenset(
    {
        "bigram_logprob_scores", "bitext_margin_pairs", "bloom_pruned_scan",
        "boilerplate_stripped_docs", "bpe_pair_counts",
        "ccnet_perplexity_buckets", "cdc_orders_state",
        "clone_divergence_nations", "compaction_roundtrip", "curation_funnel",
        "delete_where_roundtrip", "doc_ngram_novelty", "domain_capped_sample",
        "dsir_importance_weights", "epoch_shuffled_order",
        "expectations_report_orders", "fixed_k_per_lang_sample",
        "fuzzy_dedup_survivors", "hard_negative_mining", "hybrid_rrf_topk",
        "leakage_safe_split_report", "mor_delete_state", "mor_upsert_state",
        "mv_orders_by_status", "mv_price_extrema_by_status", "pack_sequences",
        "packed_training_text", "partition_evolution_scan", "pq_adc_topk",
        "price_percentiles", "pysink_jsonl_roundtrip", "q11_important_parts",
        "q22_idle_rich_customers", "quarantine_orders", "rollback_restore",
        "scd2_asof_state", "scd2_temporal_enrich", "schema_evolution_nullfill",
        "semantic_dedup_survivors", "simhash64_near_pairs",
        "source_overlap_matrix", "source_temperature_weights",
        "sql_lakehouse_time_travel", "stream_gap_sessions",
        "table_changes_feed", "table_snapshots_history",
        "time_travel_customer_v1", "token_counts_arrow",
        "unigram_logprob_scores", "winsorized_price_stats",
    }
)

_VERIFIED_R6 = frozenset(
    {
        "bitext_margin_pairs", "bitext_margin_pairs_exact",
        "bm25_incremental_index", "bm25_indexed_topk", "branch_backfill_scan",
        "catalog_fork_merge_state", "catalog_txn_consistent_read",
        "customers_without_orders", "dedup_clusters", "delete_where_roundtrip",
        "delta_export_roundtrip", "exact_substring_dedup_docs",
        "fuzzy_dedup_survivors", "generated_ingest_parts",
        "gopher_quality_flags", "governed_customer_scan",
        "incremental_fuzzy_dedup_docs", "ivf_kmeans_recall_verdict",
        "join_view_customer_orders", "left_join_view_customer_orders",
        "link_quality_rank", "mmr_diverse_topk", "mor_delete_state",
        "mor_upsert_state", "multimodal_retrieval_topk",
        "mv_distinct_customers_by_status", "mv_orders_by_status",
        "mv_price_extrema_by_status", "phrase_search_docs",
        "prefix_filtered_jaccard_pairs", "purge_subjects_state",
        "renamed_column_scan", "snapshot_expiry_state", "source_drift_report",
        "source_overlap_matrix", "span_corruption_pairs",
        "sql_incremental_view_state", "sql_lakehouse_time_travel",
        "sql_namespaced_layers", "sql_purge_subjects", "sql_txn_atomic_layers",
        "stats_planned_broadcast_join", "table_integrity_report",
        "table_schema_changes", "tagged_release_scan", "template_dedup_docs",
        "time_travel_customer_v1", "token_budget_selection",
        "weighted_sample_aes", "weighted_sample_per_lang",
    }
)

# Queries whose implementation or oracle was rewritten AFTER the round that
# verified them — their green row belongs to code that no longer exists
# (VERDICT r2 "What's missing #2", ADVICE r2 medium). Treated as unverified
# in the reorder so the current code gets a fresh driver verdict.
# Every r6 member earned a green r6 verdict (CORRECTNESS_r06: 50/50) and has
# been removed; list r7 rewrites here as they happen.
_REWRITTEN_SINCE_GREEN: frozenset[str] = frozenset(
    {
        # r7: approx_distinct_users rewritten from a rows-only raw-HLL-
        # estimate row into a deterministic, hashable verdict row (estimate
        # vs engine-side exact COUNT(DISTINCT) within tolerance) so it gets
        # the driver's full rows+schema+hash check (VERDICT r6 ask #5).
        "approx_distinct_users",
    }
)

# The 42 queries that entered r7 without any driver verdict (VERDICT r6
# "Next round #1": the entire r7 window goes to these). Queries registered
# NEW in r7 must sort BEHIND this carry block so they cannot displace it —
# new queries merely stay pending, which round 8 absorbs.
_NEVER_VERIFIED_CARRY = frozenset(
    {
        "phrase_snippets_docs", "boolean_search_docs", "zipf_fit_report",
        "hll_partial_merge_verdict", "cms_heavy_hitters",
        "histogram_quantile_sketch", "kmv_distinct_custkeys",
        "kmv_join_cardinality_orders", "bootstrap_mean_order_value",
        "stats_ndv_join_estimate", "ndv_drift_report", "kmv_set_ops_custkeys",
        "entity_golden_records", "hidden_partition_scan",
        "pushdown_source_scan", "pywrite_table_roundtrip",
        "event_funnel_steps", "column_profile_orders", "charclass_profile",
        "tick_vwap_daily", "asof_next_purchase", "ewma_user_value",
        "rolling_zscore_events", "asof_cogroup_pandas",
        "user_value_median_pandas", "sft_transcripts", "preference_pairs",
        "m4_downsampled_events", "stream_delta_log_appends",
        "stream_left_outer_views", "stream_quarantine_events",
        "stream_table_appends", "stream_update_counts",
        "stream_txn_append_state", "stream_cdf_mor_changes",
        "stream_erasure_tombstones", "stream_doc_dedup", "stream_bm25_index",
        "stream_cms_heavy_hitters", "stream_histogram_quantiles",
        "stream_kmv_distinct", "stream_weighted_sample",
    }
)


def _reorder_for_driver() -> None:
    """Reorder QUERIES and ORACLES so the driver's ~50 verification slots go
    where they buy new information, whichever dict the driver iterates:

    1. verified once but rewritten since (their verdict is STALE — it
       belongs to code that no longer exists, and several r4 verdict asks
       hinge on their re-green, so they must not fall off the ~50-slot
       window however many new queries a round adds),
    2. never driver-verified, with the carried-over-from-r6 block
       (``_NEVER_VERIFIED_CARRY``) strictly before queries registered new
       this round (an unverified new query merely stays pending, which
       round N+1 absorbs — VERDICT r6 #1/#3),
    3. previously verified, oldest verdict first (r1 before r2).

    Within blocks 1-2, cheap batch queries run before streaming/pysource
    end-to-end queries (micro-batch machinery dominates their wall time),
    hedging a time-budgeted driver.
    """
    verified = (
        _VERIFIED_R1 | _VERIFIED_R2 | _VERIFIED_R3 | _VERIFIED_R4
        | _VERIFIED_R5 | _VERIFIED_R6
    )

    def slow_last(names: list[str]) -> list[str]:
        slow = [n for n in names if n.startswith(("stream_", "pysource_"))]
        return [n for n in names if n not in slow] + slow

    unverified = [n for n in QUERIES if n not in verified]
    never = slow_last(
        [n for n in unverified if n in _NEVER_VERIFIED_CARRY]
    ) + slow_last([n for n in unverified if n not in _NEVER_VERIFIED_CARRY])
    stale = slow_last(
        [n for n in QUERIES if n in _REWRITTEN_SINCE_GREEN]
    )
    latest_green: dict[str, int] = {}
    for rnd, names in enumerate(
        (
            _VERIFIED_R1, _VERIFIED_R2, _VERIFIED_R3, _VERIFIED_R4,
            _VERIFIED_R5, _VERIFIED_R6,
        ),
        1,
    ):
        for n in names:
            latest_green[n] = rnd
    greens = sorted(
        (n for n in QUERIES if n in verified and n not in _REWRITTEN_SINCE_GREEN),
        key=lambda n: latest_green[n],
    )
    ordered = stale + never + greens
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
    reordered_oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    ORACLES.clear()
    ORACLES.update(reordered_oracles)


_load_all()
_reorder_for_driver()
