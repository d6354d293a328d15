"""Multi-table atomic transactions (lakeflow/txn.py): all-or-nothing
visibility through the catalog commit log, snapshot-isolated reads,
table-granular optimistic concurrency, and cross-table time travel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakeflow.tables import CommitConflictError, TableCatalog
from lakeflow.txn import CatalogRef


def _ref(spark, tmp_path):
    return CatalogRef(spark, TableCatalog(spark, str(tmp_path / "wh")))


def _df(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema)


def test_txn_publishes_all_tables_in_one_commit(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    with ref.transaction("seed") as txn:
        txn.write("base", _df(spark, [(1, 10), (2, 20)]))
        txn.write("rollup", _df(spark, [(0, 30)]))
    assert ref.current_commit() == 1
    assert set(ref.state()) == {"base", "rollup"}
    assert ref.read("base").count() == 2
    assert ref.read("rollup").count() == 1


def test_crash_before_commit_point_leaves_ref_untouched(spark, tmp_path):
    """The torn-write scenario the layer exists for: base lands, the crash
    hits before the rollup — catalog readers must see NEITHER."""
    ref = _ref(spark, tmp_path)
    with ref.transaction("seed") as txn:
        txn.write("base", _df(spark, [(1, 10)]))
        txn.write("rollup", _df(spark, [(0, 10)]))

    with pytest.raises(RuntimeError, match="boom"):
        with ref.transaction("update both") as txn:
            txn.write("base", _df(spark, [(2, 20)]))
            raise RuntimeError("boom")  # crash before rollup + commit point

    # Ref still at commit 1; the staged base snapshot is an orphan.
    assert ref.current_commit() == 1
    assert ref.read("base").count() == 1
    # The table's own HEAD did advance (durable object) — the catalog is
    # the visibility boundary, exactly Nessie's contract.
    assert ref.catalog.load("base").read().count() == 2


def test_consistent_cross_table_read_under_in_flight_txn(spark, tmp_path):
    """Invariant reads: rollup.total == sum(base.v) at EVERY catalog commit,
    even while a new transaction has half-landed."""
    ref = _ref(spark, tmp_path)
    with ref.transaction() as txn:
        txn.write("base", _df(spark, [(1, 10), (2, 20)]))
        txn.write("rollup", _df(spark, [(0, 30)]))

    txn2 = ref.transaction()
    txn2.write("base", _df(spark, [(3, 5)]), mode="append")
    # In-flight: catalog readers still see the consistent pair.
    base_sum = ref.read("base").agg(F.sum("v")).collect()[0][0]
    total = ref.read("rollup").collect()[0].v
    assert base_sum == total == 30
    txn2.write("rollup", _df(spark, [(0, 35)]))
    txn2.commit()
    assert ref.read("base").agg(F.sum("v")).collect()[0][0] == 35
    assert ref.read("rollup").collect()[0].v == 35


def test_snapshot_isolated_reads_inside_txn(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    with ref.transaction() as txn:
        txn.write("a", _df(spark, [(1, 1)]))
        txn.write("b", _df(spark, [(1, 100)]))

    txn = ref.transaction()
    txn.write("a", _df(spark, [(2, 2)]), mode="append")
    # Staged table reads back at its staged version...
    assert txn.read("a").count() == 2
    # ...untouched tables at the base commit, even after another writer lands.
    other = ref.transaction()
    other.write("b", _df(spark, [(2, 200)]), mode="append")
    other.commit()
    assert txn.read("b").count() == 1


def test_disjoint_writers_merge_overlapping_conflict(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    with ref.transaction() as txn:
        txn.write("a", _df(spark, [(1, 1)]))
        txn.write("b", _df(spark, [(1, 1)]))

    t1 = ref.transaction()
    t2 = ref.transaction()
    t3 = ref.transaction()
    t1.write("a", _df(spark, [(2, 2)]), mode="append")
    t2.write("b", _df(spark, [(2, 2)]), mode="append")
    t3.write("a", _df(spark, [(9, 9)]), mode="append")
    t1.commit()
    t2.commit()  # disjoint tables: merges onto t1's head
    assert set(ref._changed_since(1)) == {"a", "b"}
    with pytest.raises(CommitConflictError, match="'a'"):
        t3.commit()  # overlapping table: must conflict
    # Both survivors' writes visible; the loser's staged snapshot orphaned.
    assert ref.read("a").count() == 2
    assert ref.read("b").count() == 2


def test_cross_table_time_travel(spark, tmp_path):
    """Per-table time travel can't say which versions COEXISTED; the catalog
    commit can."""
    ref = _ref(spark, tmp_path)
    for i in (1, 2, 3):
        with ref.transaction(f"epoch {i}") as txn:
            txn.write("a", _df(spark, [(i, i)]), mode="overwrite")
            txn.write("b", _df(spark, [(i, i * 100)]), mode="overwrite")
    assert ref.commits() == [1, 2, 3]
    for commit in (1, 2, 3):
        ka = ref.read("a", commit=commit).collect()[0].k
        kb = ref.read("b", commit=commit).collect()[0].k
        assert ka == kb == commit
    log = ref.log()
    assert log.count() == 3
    assert [r.message for r in log.orderBy("commit").collect()] == [
        "epoch 1", "epoch 2", "epoch 3",
    ]


def test_run_stages_dml_and_pins_head(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    with ref.transaction() as txn:
        txn.write("a", _df(spark, [(1, 1), (2, 2), (3, 3)]))
        txn.write("b", _df(spark, [(0, 3)]))
    with ref.transaction() as txn:
        txn.run("a", lambda t: t.delete_where("k = 2"))
        txn.write("b", _df(spark, [(0, 2)]), mode="overwrite")
    assert [r.k for r in ref.read("a").orderBy("k").collect()] == [1, 3]
    assert ref.read("b").collect()[0].v == 2


def test_empty_and_double_commit_guards(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    txn = ref.transaction()
    with pytest.raises(RuntimeError, match="empty"):
        txn.commit()
    txn.write("a", _df(spark, [(1, 1)]))
    txn.commit()
    with pytest.raises(RuntimeError, match="already committed"):
        txn.commit()
    with pytest.raises(ValueError, match="not visible"):
        ref.read("nope")


def test_fork_merge_roundtrip(spark, tmp_path):
    """Warehouse-level branching: fork the whole catalog, change a table on
    the branch, change a DIFFERENT table on main, merge — both survive, one
    atomic merge commit."""
    main = _ref(spark, tmp_path)
    with main.transaction() as txn:
        txn.write("a", _df(spark, [(1, 1)]))
        txn.write("b", _df(spark, [(1, 10)]))

    dev = main.fork("dev")
    assert dev.state() == main.state()
    with dev.transaction() as txn:
        txn.write("a", _df(spark, [(2, 2)]), mode="append")
    with main.transaction() as txn:
        txn.write("b", _df(spark, [(2, 20)]), mode="append")

    merge_commit = main.merge_from(dev)
    assert main.current_commit() == merge_commit
    assert main.read("a").count() == 2  # dev's change
    assert main.read("b").count() == 2  # main's own change survives


def test_fork_merge_conflict_on_overlap(spark, tmp_path):
    main = _ref(spark, tmp_path)
    with main.transaction() as txn:
        txn.write("a", _df(spark, [(1, 1)]))
    dev = main.fork("dev")
    with dev.transaction() as txn:
        txn.write("a", _df(spark, [(2, 2)]), mode="append")
    with main.transaction() as txn:
        txn.write("a", _df(spark, [(3, 3)]), mode="append")
    with pytest.raises(CommitConflictError, match="'a'"):
        main.merge_from(dev)


def test_fork_guards_and_unrelated_merge(spark, tmp_path):
    main = _ref(spark, tmp_path)
    with main.transaction() as txn:
        txn.write("a", _df(spark, [(1, 1)]))
    main.fork("dev")
    with pytest.raises(ValueError, match="already exists"):
        main.fork("dev")
    from lakeflow.txn import CatalogRef

    stranger = CatalogRef(spark, main.catalog, ref="stranger")
    with pytest.raises(ValueError, match="not forked from"):
        main.merge_from(stranger)
    dev = CatalogRef(spark, main.catalog, ref="dev")
    with pytest.raises(ValueError, match="nothing to merge"):
        main.merge_from(dev)


def test_expire_commits_keeps_recent_window(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    for i in (1, 2, 3, 4):
        with ref.transaction(f"e{i}") as txn:
            txn.write("a", _df(spark, [(i, i)]), mode="overwrite")
    dropped = ref.expire_commits(keep_last=2)
    assert dropped == [1, 2]
    assert ref.commits() == [3, 4]
    assert ref.read("a", commit=3).collect()[0].k == 3
    assert ref.read("a").collect()[0].k == 4


def _purge_fixture(spark, tmp_path):
    ref = _ref(spark, tmp_path)
    with ref.transaction("ingest") as txn:
        txn.write("users", _df(spark, [(1, 10), (2, 20), (3, 30)]))
        txn.write("events", _df(spark, [(1, 1), (1, 2), (2, 3), (3, 4)]))
    return ref, {"users": "k = 1", "events": "k = 1"}


def test_purge_subjects_is_atomic_across_tables(spark, tmp_path):
    ref, conds = _purge_fixture(spark, tmp_path)
    # Torn purge: one table's MOR delete lands, the crash hits before the
    # catalog commit point — catalog readers must see NO erasure at all.
    txn = ref.transaction("torn purge")
    txn.run("users", lambda t: t.delete_where_mor(conds["users"]))
    # no commit — crash
    assert ref.read("users").filter("k = 1").count() == 1
    assert ref.read("events").filter("k = 1").count() == 2

    commit = ref.purge_subjects(conds, "erasure: subject k=1")
    assert commit == ref.current_commit()
    assert ref.read("users").filter("k = 1").count() == 0
    assert ref.read("events").filter("k = 1").count() == 0
    assert ref.read("users").count() == 2
    assert ref.read("events").count() == 2


def test_logical_purge_hides_physical_purge_removes(spark, tmp_path):
    ref, conds = _purge_fixture(spark, tmp_path)
    ref.purge_subjects(conds)
    users = ref.catalog.load("users")
    # Invisible to readers, still in storage.
    assert ref.read("users").filter("k = 1").count() == 0
    assert users.scan_physical().filter("k = 1").count() == 1

    ref.materialize_purge(["users", "events"])
    assert users.scan_physical().filter("k = 1").count() == 0
    assert ref.catalog.load("events").scan_physical().filter("k = 1").count() == 0
    # Logically a no-op: the surviving rows are unchanged.
    assert ref.read("users").count() == 2
    assert ref.read("events").count() == 2


def test_materialize_purge_expire_history_closes_time_travel(spark, tmp_path):
    ref, conds = _purge_fixture(spark, tmp_path)
    ref.purge_subjects(conds)
    # Audit-window form: pre-purge state stays time-travel readable.
    assert ref.read("users", commit=1).filter("k = 1").count() == 1

    ref.materialize_purge(["users", "events"], expire_history=True)
    assert ref.commits() == [3]
    # Per-table history is gone too: only the rewritten snapshot survives.
    assert ref.catalog.load("users").versions() == [
        ref.catalog.load("users").current_version()
    ]
