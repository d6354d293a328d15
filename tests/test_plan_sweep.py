"""Global physical-plan sweep: no registered pure-read query may plan a
CartesianProduct, and the set of queries planning a BroadcastNestedLoopJoin
is PINNED — every member is an intentional broadcast of a scalar/tiny frame
(a top-k threshold, a corpus-stats row, a HAVING-scalar subquery), and any
NEW appearance fails loudly so an accidental cartesian can never slip into
the registry unreviewed. This turns the 'no accidental cross joins' scale
claim (SCALE.md §2) into a tested invariant over the whole surface rather
than a handful of per-query plan tests.

Scope: queries whose callable neither streams nor materializes state
(source-marker filter below) — their DataFrames build in milliseconds at
sf0.001 and `sparkPlan()` plans without executing. Stateful/streaming
queries keep their dedicated plan tests in test_plan_shapes.py.
"""

from __future__ import annotations

import inspect

from lakeflow.queries import QUERIES

from .conftest import SF_DIR

_STATEFUL_MARKERS = (
    "tempfile",
    "VersionedTable",
    "mkdtemp",
    "write_stream",
    "run_to_memory",
    "register_views",
    "catalog_txn",
    "sqlx",
)
_SKIP_PREFIXES = ("stream_", "pysource", "pysink", "pywrite", "sql_", "ddl_")

# Every member broadcasts a frame bounded by a constant or a group-count
# (≤ a few rows) against the big side — the sanctioned scalar-threshold
# pattern. Additions require the same justification here.
KNOWN_BNLJ = {
    # bitext_margin_pairs_exact retired r13 — its oracle and the exact
    # cross-join composition live on in tests/test_retired_queries.py,
    # outside this sweep.
    "bm25_keyword_topk",
    "bootstrap_mean_order_value",
    "ccnet_perplexity_buckets",
    "cosine_topk",
    "domain_capped_sample",
    "epoch_shuffled_order",
    "filtered_cosine_topk",
    "hard_negative_mining",
    "histogram_quantile_sketch",
    "hll_partial_merge_verdict",
    "hybrid_rrf_topk",
    "kmv_join_cardinality_orders",
    "kmv_set_ops_custkeys",
    "multimodal_retrieval_topk",
    "pq_adc_topk",
    "q11_important_parts",
    "q22_idle_rich_customers",
    "semantic_dedup_survivors",
    "source_drift_report",
    "sq8_embedding_recall_verdict",
    "token_budget_selection",
}


def _pure_read_queries():
    out = {}
    for name, fn in QUERIES.items():
        if name.startswith(_SKIP_PREFIXES):
            continue
        if any(m in inspect.getsource(fn) for m in _STATEFUL_MARKERS):
            continue
        out[name] = fn
    return out


def test_no_cartesian_and_pinned_bnlj_across_pure_read_queries(spark):
    qs = _pure_read_queries()
    # The sweep must keep covering the bulk of the batch surface — a
    # marker-filter change that silently shrinks it would hollow the
    # invariant out.
    assert len(qs) >= 120, f"plan sweep covers only {len(qs)} queries"
    cart, bnlj = [], []
    for name, fn in sorted(qs.items()):
        plan = fn(spark, SF_DIR)._jdf.queryExecution().sparkPlan().toString()
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in plan:
            bnlj.append(name)
    assert not cart, f"CartesianProduct planned by: {cart}"
    new = set(bnlj) - KNOWN_BNLJ
    gone = KNOWN_BNLJ - set(bnlj)
    assert not new, (
        f"NEW BroadcastNestedLoopJoin planned by {sorted(new)} — if the "
        f"broadcast side is provably scalar/tiny, pin it in KNOWN_BNLJ "
        f"with the justification; otherwise fix the join condition"
    )
    assert not gone, (
        f"pinned BNLJ disappeared for {sorted(gone)} — the plan improved "
        f"or the query changed; update KNOWN_BNLJ so the pin stays exact"
    )
