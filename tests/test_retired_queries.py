"""Oracle-parity coverage for RETIRED registry queries (SCALE.md §10).

Retirement moves a query out of the driver-facing registry, not out of the
correctness surface: per the policy, the callable's parity check moves here
and keeps running against the same DuckDB oracle with the driver's own
comparison (sorted stringified rows). The ledger in
scripts/retired_queries.json is the authoritative list; every entry must
have a test in this module, and a retired name must never reappear in the
registry (its CORRECTNESS_r*.json history would lend verdicts the new code
never earned).
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SF_DIR = os.environ.get("LAKEFLOW_TEST_SF_DIR", "/root/testdata/sf0.001")
_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _oracle_rows(sql: str):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{_SF_DIR}/{t}.parquet'"
        )
    return sorted(tuple(str(x) for x in r) for r in con.execute(sql).fetchall())


def test_ledger_names_never_reregister():
    from lakeflow.queries import QUERIES

    with open(os.path.join(_REPO, "scripts", "retired_queries.json")) as f:
        retired = set(json.load(f)["retired"])
    clash = retired & set(QUERIES)
    assert not clash, (
        f"retired names re-registered: {sorted(clash)} — they would inherit "
        f"historical CORRECTNESS verdicts the new code never earned"
    )


def test_ivf_topk_retired_parity(spark):
    """ivf_topk (retired r11, superseded by ivf_kmeans_topk): the exact
    registered form — 16 seed centroids (vec_id < 16), 10 query vectors
    (vec_id < 10), 4 probed cells, top-5 — against its DuckDB oracle,
    compared exactly as the driver compared it."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators import similarity as sim
    from lakeflow.queries.northstar import _IVF_TOPK_ORACLE

    emb = load_table(spark, _SF_DIR, "embeddings")
    got = sim.ivf_topk(
        emb,
        queries=emb.filter(F.col("vec_id") < 10),
        centroids=emb.filter(F.col("vec_id") < 16),
        k=5,
        n_probe=4,
    )
    spark_rows = sorted(
        tuple(str(x) for x in r) for r in got.collect()
    )
    assert spark_rows == _oracle_rows(_IVF_TOPK_ORACLE)
    assert len(spark_rows) > 0


def test_bitext_margin_pairs_exact_retired_parity(spark):
    """bitext_margin_pairs_exact (retired r13, superseded by
    bitext_margin_pairs): the exact registered form — label-0 sources x
    label-1 targets, k=4 neighborhood sums in integer micro-units,
    ratio-margin >= 1.0, best target per source — against its DuckDB
    oracle, compared exactly as the driver compared it."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators import similarity as sim
    from lakeflow.queries.northstar import _BITEXT_EXACT_ORACLE

    emb = load_table(spark, _SF_DIR, "embeddings")
    got = sim.margin_knn_pairs(
        emb.filter(F.col("label") == 0),
        emb.filter(F.col("label") == 1),
        k=4,
        min_margin=1.0,
    )
    spark_rows = sorted(tuple(str(x) for x in r) for r in got.collect())
    assert spark_rows == _oracle_rows(_BITEXT_EXACT_ORACLE)
    assert len(spark_rows) > 0
