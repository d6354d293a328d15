"""KMV (bottom-k / theta) distinct sketch — operator-level contracts the
registered queries rely on: exactness below k, the (k-1)/u_(k) error
envelope, EXACT mergeability (the property the streaming ingest is built
on), set-algebra identities, and the map-side bottom-k plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lakeflow.operators.aggregates import (
    kmv_estimate,
    kmv_minima,
    kmv_set_ops,
    merge_kmv_minima,
)


def _ids(spark, lo: int, hi: int):
    return spark.range(lo, hi).select(F.col("id"))


def test_exact_below_k(spark):
    df = _ids(spark, 0, 50)
    est = kmv_estimate(kmv_minima(df, "id", 64), 64).collect()[0]
    assert est["sketch_size"] == 50
    assert est["est_distinct"] == 50.0


def test_estimate_error_bound(spark):
    # 5000 distinct ids, k=256: deterministic estimate must sit inside a
    # 3.5-sigma envelope (sigma ~ 1/sqrt(k-2)).
    n, k = 5000, 256
    est = kmv_estimate(kmv_minima(_ids(spark, 0, n), "id", k), k).collect()[0]
    assert est["sketch_size"] == k
    rel = abs(est["est_distinct"] - n) / n
    assert rel < 3.5 / math.sqrt(k - 2), est["est_distinct"]


def test_duplicates_do_not_move_the_sketch(spark):
    base = _ids(spark, 0, 300)
    dup = base.unionAll(base).unionAll(_ids(spark, 0, 100))
    a = sorted(r["u"] for r in kmv_minima(base, "id", 32).collect())
    b = sorted(r["u"] for r in kmv_minima(dup, "id", 32).collect())
    assert a == b


def test_merge_recovers_one_pass_sketch_exactly(spark):
    # Partition the ids three ways (simulated micro-batches), sketch each
    # part, fold — the fold must equal the one-pass sketch EXACTLY.
    k = 64
    df = _ids(spark, 0, 2000)
    direct = sorted(r["u"] for r in kmv_minima(df, "id", k).collect())
    parts = df.withColumn("b", F.col("id") % 3)
    partials = kmv_minima(parts, "id", k, group_cols=["b"])
    folded = sorted(
        r["u"] for r in merge_kmv_minima(partials.select("u"), k).collect()
    )
    assert folded == direct


def test_grouped_merge_recovers_grouped_sketch(spark):
    k = 16
    df = _ids(spark, 0, 1000).select(
        "id", (F.col("id") % 4).alias("g"), (F.col("id") % 7).alias("b")
    )
    direct = {
        (r["g"], r["u"])
        for r in kmv_minima(df, "id", k, group_cols=["g"]).collect()
    }
    partials = kmv_minima(df, "id", k, group_cols=["g", "b"])
    folded = {
        (r["g"], r["u"])
        for r in merge_kmv_minima(
            partials.select("g", "u"), k, group_cols=["g"]
        ).collect()
    }
    assert folded == direct


def test_set_ops_identity(spark):
    k = 64
    a = kmv_minima(_ids(spark, 0, 500), "id", k)
    row = kmv_set_ops(a, a, k).collect()[0]
    assert row["jaccard"] == 1.0
    assert row["union_est"] == row["intersect_est"]


def test_set_ops_disjoint(spark):
    k = 128
    a = kmv_minima(_ids(spark, 0, 1000), "id", k)
    b = kmv_minima(_ids(spark, 1000, 2000), "id", k)
    row = kmv_set_ops(a, b, k).collect()[0]
    assert row["jaccard"] == 0.0
    assert row["intersect_est"] == 0.0
    assert abs(row["union_est"] - 2000) / 2000 < 3.5 / math.sqrt(k - 2)


def test_set_ops_subset(spark):
    # B ⊂ A: intersection estimate must track |B| and union must track |A|.
    k = 128
    a = kmv_minima(_ids(spark, 0, 2000), "id", k)
    b = kmv_minima(_ids(spark, 0, 500), "id", k)
    row = kmv_set_ops(a, b, k).collect()[0]
    tol = 4.5 / math.sqrt(k - 2)
    assert abs(row["union_est"] - 2000) / 2000 < tol
    assert abs(row["intersect_est"] - 500) / 500 < tol


def test_bottom_k_is_pruned_map_side(spark):
    # The per-group bottom-k must compile to a WindowGroupLimit (rank-limit
    # pushed below the shuffle) — the property that keeps the shuffle at
    # <= k rows per group per map task at 100 TB.
    df = _ids(spark, 0, 1000).select("id", (F.col("id") % 4).alias("g"))
    plan = kmv_minima(df, "id", 16, group_cols=["g"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_join_cardinality_uniform_model(spark):
    from lakeflow.operators.aggregates import kmv_join_cardinality

    # Unique keys both sides, 1000-key overlap: the uniform-frequency
    # model reduces to the overlap itself.
    a, b = _ids(spark, 0, 2000), _ids(spark, 1000, 3000)
    row = kmv_join_cardinality(a, "id", b, "id", 256).collect()[0]
    assert (row["n_a"], row["n_b"]) == (2000, 2000)
    assert 700 < row["est_join_rows"] < 1300, row["est_join_rows"]

    # Fan-out side: duplicating one side doubles the estimate exactly
    # (same sketches, n_a doubles).
    row2 = kmv_join_cardinality(
        a.unionAll(a), "id", b, "id", 256
    ).collect()[0]
    # (2e-4 headroom: each side rounds to 4dp independently)
    assert abs(row2["est_join_rows"] - 2 * row["est_join_rows"]) < 2e-4


def test_poisson_bootstrap_brackets_true_mean(spark):
    from lakeflow.operators.aggregates import poisson_bootstrap_ci

    # cents metric with known mean 100.5 dollars over 2000 rows: the
    # deterministic bootstrap band must bracket the point mean, and a
    # re-run must reproduce it bit-for-bit.
    df = spark.range(0, 2000).select(
        F.col("id"), (F.lit(10000) + (F.col("id") % 101)).alias("cents")
    )
    r1 = poisson_bootstrap_ci(df, "id", "cents", n_reps=16).collect()[0]
    r2 = poisson_bootstrap_ci(df, "id", "cents", n_reps=16).collect()[0]
    assert r1 == r2
    assert r1["n_rows"] == 2000 and r1["n_reps"] == 16
    assert r1["boot_lo"] <= r1["point_mean"] <= r1["boot_hi"]
    assert r1["contains_point"]
    # Band width should be on the order of sigma/sqrt(n), not degenerate
    # and not wild: sigma(cents) ~ 29.2 cents -> se ~ 0.0065 dollars.
    width = r1["boot_hi"] - r1["boot_lo"]
    assert 0.001 < width < 0.2, width


def test_analyze_ndv_and_stats_join(spark, tmp_path):
    from lakeflow.operators.joins import stats_join_cardinality
    from lakeflow.tables import TableCatalog

    cat = TableCatalog(spark, str(tmp_path / "wh"))
    ta = cat.create(
        "a", spark.range(0, 3000).selectExpr("id", "id % 700 AS key")
    )
    tb = cat.create("b", spark.range(0, 500).selectExpr("id AS key"))
    ta.analyze_ndv(["key"], k=128)
    tb.analyze_ndv(["key"], k=128)
    sa = ta.ndv_stats("key")
    assert sa["rows"] == 3000
    assert abs(sa["estimate"] - 700) / 700 < 3.5 / math.sqrt(126)
    sb = tb.ndv_stats("key")
    assert abs(sb["estimate"] - 500) / 500 < 3.5 / math.sqrt(126)
    # Below k the stored sketch is EXACT: re-analyze b at a wider k.
    tb.analyze_ndv(["key"], k=1024)
    assert tb.ndv_stats("key")["estimate"] == 500.0

    est = stats_join_cardinality(ta, "key", tb, "key")
    exact = (
        ta.read().join(tb.read().withColumnRenamed("key", "k2"),
                       F.col("key") == F.col("k2")).count()
    )
    assert 0.5 * exact <= est["est_join_rows"] <= 2.0 * exact, (est, exact)

    # Metadata-only: reading stats must not touch the data (drop the
    # underlying frames' source and the manifests still answer).
    assert ta.ndv_stats("key")["k"] == 128
