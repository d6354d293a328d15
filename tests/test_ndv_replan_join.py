"""ndv_planned_join: stale ANALYZE stats mis-plan the broadcast; the drift
trigger re-ANALYZEs and flips the strategy (VERDICT r6 ask #7).

Reference analogue: the manual ``broadcast()`` at
``/root/reference/src/gold/dim_company.py:34`` hard-codes the decision a
cost-based planner makes from statistics — and both go wrong the same way
when the "small" side grows without a re-ANALYZE.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakeflow.operators.joins import ndv_planned_join
from lakeflow.tables import VersionedTable


def _tables(spark, tmp_path):
    """fact: analyzed at 1/32 of its rows, then appended to full size
    (stats now lie 32x low). dim: analyzed fresh."""
    fact = VersionedTable(spark, str(tmp_path / "fact"))
    fact.commit(
        spark.range(0, 6400, 32).select(
            (F.col("id") % 200).alias("k"), F.col("id").alias("v")
        )
    )
    fact.analyze_ndv(["k"], k=64)
    fact.commit(
        spark.range(6400).filter(F.col("id") % 32 != 0).select(
            (F.col("id") % 200).alias("k"), F.col("id").alias("v")
        ),
        mode="append",
    )
    dim = VersionedTable(spark, str(tmp_path / "dim"))
    dim.commit(
        spark.range(200).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    )
    dim.analyze_ndv(["k"], k=64)
    return fact, dim


def test_stale_stats_pick_the_wrong_side_without_refresh(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    # Stored fact rows = 200 (analyze-time); live = 6400. Threshold 400:
    # the stale planner broadcasts the FACT side — the 100 TB disaster.
    df, d = ndv_planned_join(
        fact, dim, on=["k"], broadcast_rows=400, refresh_stale=False
    )
    assert d["initial_side"] == "left"
    assert d["final_side"] == "left"  # nothing corrected it
    assert d["refreshed"] == []
    assert df.count() == 6400


def test_drift_trigger_reanalyzes_and_flips_the_broadcast(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    df, d = ndv_planned_join(fact, dim, on=["k"], broadcast_rows=400)
    # Same initial mis-plan...
    assert d["initial_side"] == "left"
    # ...but the drift check (live 6400 vs stored 200 = 32x, far outside
    # the 1.2 band) re-ANALYZEs the fact side and the re-plan broadcasts
    # the dim instead.
    assert d["refreshed"] == ["left"]
    assert d["drift_left"] > 30
    assert d["final_side"] == "right"
    assert d["stored_rows"] == (6400, 200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert df.count() == 6400
    # The re-ANALYZE persisted: a second plan over the same tables now
    # starts from fresh statistics and never mis-plans.
    _, d2 = ndv_planned_join(fact, dim, on=["k"], broadcast_rows=400)
    assert d2["initial_side"] == "right"
    assert d2["refreshed"] == []


def test_fresh_stats_plan_without_reanalyze(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    fact.analyze_ndv(["k"], k=64)  # bring stats current up front
    df, d = ndv_planned_join(fact, dim, on=["k"], broadcast_rows=400)
    assert d["refreshed"] == []
    assert d["initial_side"] == d["final_side"] == "right"
    assert df.count() == 6400


def test_neither_side_fits_falls_back_to_shuffle(spark, tmp_path):
    fact, dim = _tables(spark, tmp_path)
    df, d = ndv_planned_join(fact, dim, on=["k"], broadcast_rows=100)
    assert d["final_side"] is None
    assert df.count() == 6400


def test_ndv_stats_survive_appends_but_follow_column_ddl(spark, tmp_path):
    """ANALYZE output rides every commit (stale, not vanished), renames
    with its column, and retires when the column drops — the carry-forward
    must never resurrect stats for a name the schema no longer has."""
    import pytest

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
    )
    t.analyze_ndv(["k", "v"], k=32)
    t.commit(
        spark.range(100, 150).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        ),
        mode="append",
    )
    assert t.ndv_stats("k")["rows"] == 100  # survived, stale by design

    t.rename_column("k", "key")
    assert t.ndv_stats("key")["k"] == 32
    with pytest.raises(ValueError):
        t.ndv_stats("k")

    t.drop_column("v")
    with pytest.raises(ValueError):
        t.ndv_stats("v")
    # A later unrelated commit must not resurrect the dropped column's stats.
    t.commit(
        spark.range(150, 160).select(F.col("id").alias("key")),
        mode="append",
        merge_schema=True,
    )
    with pytest.raises(ValueError):
        t.ndv_stats("v")
    assert t.ndv_stats("key")["rows"] == 100


def test_overwrite_drops_stats_like_deletion_vectors(spark, tmp_path):
    """A full-rewrite overwrite (possibly with a new schema) must DROP the
    carried NDV block — sketches of replaced data must not resurrect onto
    a snapshot they never described (the code-review r7 finding)."""
    import pytest

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(50).select(F.col("id").alias("a")))
    t.analyze_ndv(["a"], k=16)
    assert t.ndv_stats("a")["rows"] == 50
    t.commit(
        spark.range(10).select(F.col("id").alias("x")), mode="overwrite"
    )
    with pytest.raises(ValueError):
        t.ndv_stats("a")
    # Re-ANALYZE of the new schema works and survives a later append.
    t.analyze_ndv(["x"], k=16)
    t.commit(
        spark.range(10, 20).select(F.col("id").alias("x")), mode="append"
    )
    assert t.ndv_stats("x")["rows"] == 10


def test_rollback_restores_target_version_ndv(spark, tmp_path):
    """RESTORE rewinds DATA state, and ANALYZE statistics are data state:
    the rollback manifest must pin the TARGET version's ndv block — not
    let the shared-dirs carry attach the abandoned head's statistics
    (rows/sketches over data the restored snapshot no longer contains),
    nor lose the stats the target itself had (ADVICE r8 medium)."""
    import pytest

    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(100).select(F.col("id").alias("k")))   # v1
    t.analyze_ndv(["k"], k=32)                                  # v2: rows=100
    t.commit(
        spark.range(100, 800).select(F.col("id").alias("k")), mode="append"
    )                                                           # v3
    t.analyze_ndv(["k"], k=32)                                  # v4: rows=800
    assert t.ndv_rows() == 800

    t.rollback(2)
    # The restored snapshot carries ITS OWN statistics, not the head's.
    assert t.ndv_rows() == 100
    assert t.ndv_stats("k")["rows"] == 100

    # Rolling back to a never-analyzed version leaves NO statistics —
    # the abandoned head's ndv must not leak in through the carry.
    t.rollback(1)
    with pytest.raises(ValueError):
        t.ndv_rows()


def test_compact_carries_analyze_stats(spark, tmp_path):
    """OPTIMIZE is logically a no-op — the compacted snapshot holds the
    same visible rows — so valid ANALYZE statistics survive it instead of
    forcing a re-ANALYZE after every compaction (ADVICE r8)."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(60).select(F.col("id").alias("k")))
    t.commit(
        spark.range(60, 90).select(F.col("id").alias("k")), mode="append"
    )
    t.analyze_ndv(["k"], k=32)
    before = t.ndv_stats("k")

    t.compact()  # full rewrite, no shared dirs — the exempted path
    after = t.ndv_stats("k")
    assert after == before
    assert t.ndv_rows() == 90
    assert t.read().count() == 90


def test_row_count_is_column_independent(spark, tmp_path):
    """The broadcast decision needs the table-level row count, which every
    ANALYZE records whatever columns it sketched — so a multi-key join,
    or a table ANALYZEd on a non-join column, plans fine instead of
    raising from the first key's missing sketch (ADVICE r8)."""
    fact = VersionedTable(spark, str(tmp_path / "fact"))
    fact.commit(
        spark.range(3000).select(
            (F.col("id") % 100).alias("k"), (F.col("id") % 7).alias("k2")
        )
    )
    # ANALYZE sketches only a NON-join column; the row count still lands.
    fact.analyze_ndv(["k2"], k=32)
    dim = VersionedTable(spark, str(tmp_path / "dim"))
    dim.commit(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("k2")
        )
    )
    dim.analyze_ndv(["k2"], k=32)

    # Multi-key join on (k, k2): plans from the manifest row counts.
    df, d = ndv_planned_join(
        fact, dim, on=["k", "k2"], broadcast_rows=500, refresh_stale=False
    )
    assert d["final_side"] == "right"  # dim is the broadcast-able side
    assert d["stored_rows"] == (3000, 100)
    assert df.count() > 0


def test_clone_branch_and_fast_forward_carry_stats_provenance(spark, tmp_path):
    """ANALYZE statistics and hidden-transform specs are data state: a
    clone and a branch seed describe exactly the rows they reference, so
    both must carry them; a fast-forward must publish the BRANCH head's
    statistics, never let the shared-dirs carry attach main's stale block
    to a snapshot holding the branch's rows."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 9).alias("user_id")
        ),
        partition_by=["bucket(4, user_id)"],
    )
    t.analyze_ndv(["k"], k=32)
    assert t.ndv_rows() == 100
    specs = t.hidden_partition_specs()
    assert set(specs) == {"user_id"}

    # Clone: stats + specs ride along (zero data copied, same rows).
    clone = t.clone_to(str(tmp_path / "clone"))
    assert clone.ndv_rows() == 100
    assert clone.hidden_partition_specs() == specs

    # Branch: the seed describes the fork snapshot's rows.
    b = t.create_branch("audit")
    assert b.ndv_rows() == 100
    assert b.hidden_partition_specs() == specs

    # Branch appends + re-ANALYZEs; main's stats stay at 100.
    b.commit(
        spark.range(100, 700).select(
            F.col("id").alias("k"), (F.col("id") % 9).alias("user_id")
        ),
        mode="append",
    )
    b.analyze_ndv(["k"], k=32)
    assert b.ndv_rows() == 700
    assert t.ndv_rows() == 100

    # Fast-forward publishes the BRANCH's statistics onto main. The
    # branch head SHARES dirs with main (it only appended), so without
    # the explicit ndv key the shared-dirs carry would keep main's
    # stale rows=100 block on a snapshot that holds 700 rows — the
    # wrong-provenance injection this test pins against.
    t.fast_forward("audit")
    assert t.ndv_rows() == 700
    assert t.read().count() == 700


def test_zorder_carries_analyze_stats(spark, tmp_path):
    """OPTIMIZE ZORDER is row-preserving like compaction (it reads through
    the deletion vectors and rewrites the same visible rows), so valid
    ANALYZE statistics survive it too."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(400).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("w")
        )
    )
    t.analyze_ndv(["k"], k=32)
    before = t.ndv_stats("k")
    t.optimize_zorder(["k", "w"], n_dirs=4)
    assert t.ndv_stats("k") == before
    assert t.ndv_rows() == 400


def test_stale_band_boundary_is_exact_at_six_fifths():
    """VERDICT r8 ask #5: the shared integer predicate agrees with the
    DuckDB oracle's cross-multiplication exactly AT the 6/5 (and 5/6)
    boundary — a ratio of exactly the threshold is FRESH, one row past it
    is STALE, on both sides of the band and at sizes where float division
    of the ratio would round."""
    from lakeflow.operators.joins import ndv_stats_stale

    # Exactly 6/5 up-drift: fresh. One more row: stale.
    assert not ndv_stats_stale(6, 5)
    assert ndv_stats_stale(7, 5)
    # Exactly 5/6 down-drift: fresh. One fewer: stale.
    assert not ndv_stats_stale(5, 6)
    assert ndv_stats_stale(4, 6)
    # Large counts where live/stored == 1.2 is not representable exactly
    # in binary floating point: the integer form must still call FRESH.
    stored = 10_000_000_001
    live = stored * 6 // 5  # floor: ratio just UNDER 6/5 -> fresh
    assert not ndv_stats_stale(live, stored)
    assert ndv_stats_stale(live + 2, stored)
    # Never-analyzed / analyzed-empty is always stale.
    assert ndv_stats_stale(0, 0)
    assert ndv_stats_stale(100, 0)
    # Equal counts are fresh; a custom threshold parses exactly from str.
    assert not ndv_stats_stale(100, 100)
    assert not ndv_stats_stale(3, 2, drift_threshold=1.5)
    assert ndv_stats_stale(4, 2, drift_threshold=1.5)
