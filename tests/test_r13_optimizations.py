"""Focused equivalence pins for the r13 optimization rewrites.

Each test pins an operator whose INTERNALS changed in the r13 optimization
round against an independent computation of the same contract:

* densify_interpolate — the lead-based gap-explode path (offgrid="error"/
  "snap") must emit exactly what the legacy spine-join path ("ignore")
  emits on on-grid data, including null-valued observations (which make
  the bfill/ffill anchor arms live).
* bm25_topk — the single-pass array form must reproduce the pre-r13
  relational form (tf/dl/df/stats as separate aggregates) bit-exactly,
  including duplicate query terms, which the relational form counted once.
* word_shingles / simhash tokenization — array_distinct-in-the-row must
  produce the same SET as a global distinct (no duplicates, no losses).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_densify_lead_path_matches_legacy_join_path(spark):
    """On on-grid data the rewritten (lead-based) path and the legacy
    spine-join path are the same function — including null-valued
    observations, interior gaps, single-point keys, and edge anchors."""
    from lakeflow.operators.timeseries import densify_interpolate

    rows = [
        # key 1: gaps + a null observation in the middle (null v extends
        # the span and interpolates like a missing bucket, but stays
        # observed=False with its bucket present).
        (1, 0, 1.0),
        (1, 3600 * 3, None),
        (1, 3600 * 5, 6.0),
        (1, 3600 * 9, 2.0),
        # key 2: single observation (degenerate span).
        (2, 7200, 4.5),
        # key 3: null at the EDGE (bfill arm live: first bucket unobserved).
        (3, 0, None),
        (3, 3600, 8.0),
        # key 4: null at the tail (ffill arm live).
        (4, 0, 3.0),
        (4, 3600 * 2, None),
    ]
    df = spark.createDataFrame(rows, "user_id long, bucket long, v double")
    new = _rows(densify_interpolate(df, offgrid="error"))
    legacy = _rows(densify_interpolate(df, offgrid="ignore"))
    assert new == legacy
    # And the snap path on already-aligned data is the same function too.
    snapped = _rows(densify_interpolate(df, offgrid="snap"))
    assert snapped == legacy


def test_bm25_single_pass_matches_relational_form(spark):
    """The r13 single-pass bm25_topk must be bit-identical to the pre-r13
    relational formulation on the same tiny corpus — same micro-unit
    rounding, same doc set (>=1 matching term), duplicate query terms
    counted once."""
    from lakeflow.operators.dedup import normalize_text
    from lakeflow.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark shuffles data across the cluster"),
            (2, "spark spark spark tuning guide"),
            (3, "completely unrelated text about cooking"),
            (4, "data locality and shuffle tuning in spark"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    terms = ["spark", "shuffle", "spark"]  # duplicate on purpose
    k1, b = 1.2, 0.75

    got = {
        (r.doc_id, r.bm25)
        for r in bm25_topk(docs, terms, k=10, k1=k1, b=b).collect()
    }

    # Independent reference: the pre-r13 relational shape, computed with
    # plain Python over collected tokens (no Spark expressions shared with
    # the implementation under test).
    toks = {
        r.doc_id: r.t
        for r in docs.select(
            "doc_id", F.split(normalize_text("text"), " ").alias("t")
        ).collect()
    }
    uniq_terms = list(dict.fromkeys(terms))
    n = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    avgdl = sum_dl / n
    df_t = {
        t: sum(1 for tk in toks.values() if t in tk) for t in uniq_terms
    }
    expected = {}
    for doc, tk in toks.items():
        micro = 0
        hit = False
        for t in uniq_terms:
            tf = sum(1 for x in tk if x == t)
            if tf == 0:
                continue
            hit = True
            idf = math.log((n - df_t[t] + 0.5) / (df_t[t] + 0.5) + 1.0)
            score = idf * (
                tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(tk) / avgdl))
            )
            micro += math.floor(score * 1_000_000.0 + 0.5)
        if hit:
            expected[doc] = micro / 1_000_000.0
    assert got == set(expected.items())


def test_word_shingles_row_local_dedup_equals_global_distinct(spark):
    """array_distinct inside the row must equal the old global distinct:
    no duplicate (id, shingle) rows, and the same set."""
    from lakeflow.operators.dedup import word_shingles

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # repeated shingles inside one doc
            (2, "a b c"),              # same shingle text in another doc
            (3, "x"),                  # shorter than n
        ],
        "doc_id long, text string",
    )
    out = word_shingles(docs, n=3).collect()
    pairs = [(r.id, r.shingle) for r in out]
    assert len(pairs) == len(set(pairs)), "intra-doc duplicates survived"
    assert set(pairs) == {
        (1, "a b c"), (1, "b c a"), (1, "c a b"),
        (2, "a b c"),
        (3, "x"),
    }


def test_simhash_array_distinct_matches_global_distinct_signature(spark):
    """simhash16 over a doc with heavy token repetition must equal the
    signature of the same doc with each token appearing once — the
    pre-r13 global (id, tok) distinct guaranteed exactly that."""
    from lakeflow.operators.dedup import simhash16

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma alpha alpha beta"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    sig = {r.id: r.simhash for r in simhash16(docs).collect()}
    assert sig[1] == sig[2]


def test_q21_aggregate_form_matches_self_join_form(spark, tmp_path):
    """The r13 two-level-aggregate q21 must equal the decorrelated
    semi/anti self-join form it replaced, on a corpus engineered to hit
    every branch (single-supplier orders, multi-supplier single-late,
    multi-supplier multi-late, no-late orders, non-F orders)."""
    import datetime

    d0 = datetime.date(1995, 1, 1)
    late = datetime.date(1995, 6, 1)   # > 80 days after d0
    ontime = datetime.date(1995, 1, 15)
    lineitem = [
        # order 1: two suppliers, only supp 10 late -> counts for 10
        (1, 10, late), (1, 20, ontime),
        # order 2: two suppliers, both late -> counts for nobody
        (2, 10, late), (2, 20, late),
        # order 3: single supplier late -> no other supplier, excluded
        (3, 10, late),
        # order 4: two suppliers, none late -> excluded
        (4, 10, ontime), (4, 20, ontime),
        # order 5: supp 20 late TWICE (two late rows -> numwait 2)
        (5, 20, late), (5, 20, late), (5, 30, ontime),
        # order 6: like order 1 but status O -> excluded entirely
        (6, 10, late), (6, 20, ontime),
    ]
    orders = [
        (1, "F", d0), (2, "F", d0), (3, "F", d0),
        (4, "F", d0), (5, "F", d0), (6, "O", d0),
    ]
    supplier = [(10, "Supp#10"), (20, "Supp#20"), (30, "Supp#30")]

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(
        [(o, s, datetime.datetime.combine(d, datetime.time())) for o, s, d in lineitem],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp",
    ).write.parquet(str(sf / "lineitem.parquet"))
    spark.createDataFrame(
        [(o, st, datetime.datetime.combine(d, datetime.time())) for o, st, d in orders],
        "o_orderkey long, o_orderstatus string, o_orderdate timestamp",
    ).write.parquet(str(sf / "orders.parquet"))
    spark.createDataFrame(
        supplier, "s_suppkey long, s_name string"
    ).write.parquet(str(sf / "supplier.parquet"))

    from lakeflow.queries.relational import q21_waiting_suppliers

    got = {
        (r.s_name, r.numwait)
        for r in q21_waiting_suppliers(spark, str(sf)).collect()
    }
    assert got == {("Supp#10", 1), ("Supp#20", 2)}
