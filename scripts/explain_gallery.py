#!/usr/bin/env python
"""Regenerate EXPLAIN.md: formatted physical plans for the headline queries.

Run from the repo root: ``python scripts/explain_gallery.py``. The gallery is
the reviewable record that each query's plan has the shape SCALE.md claims
(pushed filters, pruned schemas, broadcast joins, map-side partial
aggregation), at fixture scale where anyone can re-run it.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GALLERY = [
    ("q1_pricing_summary", "wide scan → pushed filter → partial+final hash agg"),
    ("q4_order_priority", "EXISTS → broadcast LEFT SEMI, date filter at scan"),
    ("q14_promo_revenue", "broadcast dim join, month filter pushed"),
    ("q18_large_volume_customers", "HAVING keyset → semi join → wide join"),
    ("q7_nation_volume", "5-table tree, two roles of one dimension"),
    ("candles_15m", "single hash aggregation with min_by/max_by"),
    ("latest_event_per_user", "ranked-dedup window"),
    ("q16_supplier_part_counts", "NOT IN → broadcast anti join → distinct agg"),
    ("q21_waiting_suppliers", "EXISTS/NOT EXISTS → semi+anti self-joins"),
    ("grouping_sets_status_flag", "Expand after join: one scan, two marginals"),
    ("stratified_lang_sample", "scan-side deterministic per-stratum filter"),
    ("fuzzy_name_pairs", "SymSpell variant equi-join (skinny hash shuffle), no per-block quadratic"),
    ("embedding_near_dups", "sign-projection probe-key equi-join — no BroadcastNestedLoopJoin"),
    ("winnow_fingerprints", "min(struct) sliding window — rightmost-argmin with no join, no Python"),
    ("ngram_jaccard_pairs", "LSH candidates (materialized) → per-pair Jaccard verify"),
    ("interpolated_hourly_value", "per-key spine explode → one shuffle, running-frame anchors both directions (no unboundedFollowing O(n²) frame)"),
    ("pack_sequences", "shard-parallel packing cumsum — no single-partition window"),
    ("doc_repetition_signals", "explode → two-stage agg, shuffle bounded by per-doc vocabulary"),
    ("salted_event_type_stats", "hot-key agg: partial on (key, salt), final on key"),
    ("unigram_logprob_scores", "vocab agg (combine-bounded, cached) → AQE-chosen re-join, one corpus scan → per-doc mean"),
    ("doc_ngram_novelty", "distinct trigrams → doc-frequency agg → uniq-share per doc (gram-keyed, never pairwise)"),
    ("curation_funnel", "one flag pass (dedup/quality/sample joins) → stage explode → 4-row funnel agg"),
    ("cdc_orders_state", "changefeed fold: ranked dedup of the batch, no global sort"),
    ("pq_adc_topk", "PQ encode (broadcast codebook) → ADC table-lookup sum → shortlist → exact re-rank"),
    ("expectations_report_orders", "all rule counters in ONE partial+final agg — no per-rule rescan"),
    ("leakage_safe_split_report", "group-fingerprint split: scan-side md5 assignment → one agg"),
    ("hard_negative_mining", "label-mismatch fused into broadcast join — pairs pruned before vector math"),
    ("simhash64_near_pairs", "SWAR 16-sum signature agg → 16-bit-block equi-join, candidates ∝ near-dups"),
    ("boilerplate_stripped_docs", "segment fp df-threshold → keyed join back → in-order reassembly, no pairwise"),
    ("ewma_user_value", "k incremental window lags — no O(n²) frame, bit-exact power-of-two weights"),
    ("fixed_k_per_lang_sample", "WindowGroupLimit prunes to top-k per stratum map-side"),
    ("semantic_dedup_survivors", "cell assignment → within-cell pair prune → anti-join survivors"),
    ("bigram_logprob_scores", "combine-bounded n-gram aggs → AQE-chosen count joins → micro-nat mean"),
    ("packed_training_text", "shard cumsum → one groupBy(bin) — the corpus moves exactly once"),
    ("event_funnel_steps", "three dependent conditional-min windows over ONE user_id exchange — no per-step self-joins"),
    ("hybrid_rrf_topk", "BM25 + cosine branches each capped to top-k_each before the fusion join"),
    ("column_profile_orders", "all per-column stats in one aggregate; exact-distinct Expand visible (approx mode drops it)"),
    # fuzzy_dedup_survivors is excluded: the iterative component rounds
    # inline their cached sub-plans repeatedly (~10k lines of formatted
    # plan); its stages are covered piecewise by ngram_jaccard_pairs and
    # the dedup plan tests.
    ("domain_capped_sample", "per-source totals (combine-bounded) → median cap → broadcast rates → scan-side keep filter"),
    ("bpe_pair_counts", "one corpus scan → vocab-sized pair agg (partial) → TakeOrdered top-k"),
    ("asof_cogroup_pandas", "bucket-keyed FlatMapCoGroupsInPandas — Python crossed O(buckets) times"),
    ("bitext_margin_pairs", "multi-probe LSH shortlist (XOR-mask fan-out → bucket equi-join, no cross join) → top-k windows → one-division margin"),
    ("multimodal_retrieval_topk", "binary → Arrow mapInPandas encoder → broadcast-query cosine top-k"),
    ("span_corruption_pairs", "pure map stage: per-row Catalyst arrays, zero exchange"),
    ("exact_substring_dedup_docs", "window fp group-by (map-side combine) → duplication-bounded join-back → per-row rebuild"),
    ("link_quality_rank", "unrolled PageRank: edge-shuffle join + partial agg per iteration"),
    ("epoch_shuffled_order", "hash-to-shard, bounded per-shard windows — no global sort"),
    ("tick_vwap_daily", "integer deci-unit weighted agg over the Python source — combine-bounded"),
    ("gopher_quality_flags", "all 7 published rules in ONE scan-side JVM projection — zero exchange, zero Python"),
    ("source_drift_report", "fixed grid (groups x buckets) — integer micro-unit TV distance, state independent of corpus size"),
    ("mmr_diverse_topk", "JVM shortlist + pair cosines (integer micro-units) → ONE cogrouped-pandas greedy per query"),
    ("preference_pairs", "per-prompt extrema via ONE shuffle of partial min/max structs — no window sort"),
    ("charclass_profile", "length-minus-stripped regexp folds — pure scan-side projection, zero exchange"),
    ("hidden_partition_scan", "partition-transform rewrite: source predicates fold onto hidden _p_* columns → PartitionFilters prune dirs before any byte"),
    ("join_view_customer_orders", "delta-join MV state read-back (refresh IO pinned by dirs_read tests, not this plan)"),
    ("m4_downsampled_events", "M4 downsample: ONE partial+final agg of struct min/max — no window, no second sort"),
    ("weighted_sample_aes", "A-ES weighted sample: TakeOrdered (per-partition top-k + k-row merge), no global sort"),
    ("weighted_sample_per_lang", "per-stratum A-ES: WindowGroupLimit prunes to top-k per lang map-side"),
    ("histogram_quantile_sketch", "mergeable bin partials (map-side combine) → tiny-frame quantile window"),
    ("prefix_filtered_jaccard_pairs", "PPJoin: rare-first array agg → prefix posexplode equi-join → pair-level positional prune (in the dedup groupBy) → array_intersect verify"),
    ("zipf_fit_report", "token freq agg → top-100 window → closed-form regression in one 6-sum aggregate"),
    ("stats_planned_broadcast_join", "manifest-bytes CBO: pruned dim broadcast despite unpruned-size estimate"),
    ("kmv_distinct_custkeys", "KMV sketch: distinct partial → WindowGroupLimit bottom-k map-side → (k-1)/u_k estimate"),
    ("kmv_set_ops_custkeys", "set algebra over two 64-double sketches — union/Jaccard/intersect without touching the sets"),
    ("bootstrap_mean_order_value", "Poisson bootstrap: group-explode → one md5 per (row,group) → 4 lanes → ONE combine-bounded agg, 32 reps in a pass"),
    ("token_budget_selection", "histogram cutoff, no rangepartitioning: corpus → weighted bin agg → tiny cumulative frame → scan-side filter"),
    ("kmv_join_cardinality_orders", "join-rows estimate from two sketches: per-side counts + overlap arithmetic, no key-set join"),
    ("entity_golden_records", "ER survivorship: checkpointed component labels (lineage truncated) → one algebraic cluster agg"),
    ("sq8_embedding_recall_verdict", "int8-quantized scoring: query set broadcast (BNLJ by design), corpus never shuffles; one qid window exchange"),
    ("stats_stale_replan_join", "drift-triggered re-ANALYZE flips the broadcast side — final plan carries the corrected hint"),
    ("stream_ann_cells_topk", "streamed-IVF probe: cells scan PartitionFilters carry cid dynamicpruning — only probed cells' bytes are read"),
    ("stream_ann_compacted_topk", "probe over the AUTO-compacted index (compact_every_n_batches folds inside foreachBatch): cid dynamicpruning survives the production fold, not just manual OPTIMIZE"),
    ("bm25_indexed_topk", "postings IN-probe (envelope-pruned files) → df from scanned rows (combine-bounded groupBy + broadcast back) → TakeOrdered"),
    ("asof_salted_purchase_view", "hot-key salted as-of: (key, day-bucket) windows + one tiny closing-summary carry — no full-history sort per key"),
]


def main() -> None:
    from lakeflow.queries import QUERIES
    from lakeflow.scratch import use_process_scratch
    from lakeflow.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("explain-gallery", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# EXPLAIN — physical plans of headline queries",
        "",
        f"Generated by `scripts/explain_gallery.py` at `{sf_dir}`; regenerate after",
        "plan-affecting changes. Assertions over these shapes live in",
        "`tests/test_plan_shapes.py`.",
        "",
    ]
    for name, why in GALLERY:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out += [f"## {name}", "", f"*{why}*", "", "```", buf.getvalue().rstrip(), "```", ""]

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "EXPLAIN.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
