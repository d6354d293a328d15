#!/usr/bin/env python
"""Layout + incremental-view tour: hidden partitioning (Iceberg partition
transforms — filter on SOURCE columns, prune on hidden ones) and the
delta-join materialized view (L⋈R maintained from manifest diffs of BOTH
bases), finishing with the SQL statement surface for the same features.

    python examples/layout_and_views.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.tables import VersionedTable
from lakeflow.views import IncrementalJoinView


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-layout", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="layout_views_")

    # -- hidden partitioning -------------------------------------------------
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    t = VersionedTable(spark, os.path.join(work, "orders"))
    t.commit(
        orders, partition_by=["year(o_orderdate)", "bucket(8, o_custkey)"]
    )
    print(f"committed under transforms: {sorted(t.hidden_partition_specs())}")
    assert not [c for c in t.read().columns if c.startswith("_p_")], (
        "hidden columns must never leak into reads"
    )

    # The caller names only SOURCE columns; the engine rewrites both
    # predicates onto the hidden partition columns so whole year/bucket
    # dirs are skipped before a byte of data is read.
    got = t.scan_transformed(
        point={"o_custkey": 37},
        between={"o_orderdate": ("1995-01-01 00:00:00", "1999-12-31 00:00:00")},
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:200] if "PartitionFilters" in plan else ""
    assert "_p_year_o_orderdate" in pf and "_p_bucket8_o_custkey" in pf
    print(f"pruned scan returned {got.count()} rows; PartitionFilters engaged")

    # -- incremental join view ----------------------------------------------
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    lt = VersionedTable(spark, os.path.join(work, "cust"))
    rt = VersionedTable(spark, os.path.join(work, "ords"))
    lt.commit(cust)
    rt.commit(
        orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice"),
        stats_cols=["c_custkey"],
    )
    view = IncrementalJoinView(
        spark, lt, rt, on=["c_custkey"], path=os.path.join(work, "state")
    )
    info = view.refresh()
    print(f"join view built: {view.read().count()} tuples, {info['dirs_read']} dirs read")

    # DML on either base folds through the delta identity; refresh IO
    # prices the churn, never |L JOIN R|.
    rt.delete_where_mor("o_totalprice < 1100.0")
    lt.delete_where("c_mktsegment = 'MACHINERY'")
    info = view.refresh()
    assert info["from_versions"] != info["to_versions"]
    full = lt.read().join(rt.read(), on="c_custkey").count()
    assert view.read_rows().count() == full
    print(f"after MOR+CoW deletes: {full} tuples, refresh read {info['dirs_read']} dirs")

    # -- the same features from SQL ------------------------------------------
    from lakeflow.sqlx import LakehouseSQL
    from lakeflow.tables import TableCatalog

    lh = LakehouseSQL(spark, TableCatalog(spark, os.path.join(work, "wh")))
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "k long, lv string"
    ).createOrReplaceTempView("lsrc")
    spark.createDataFrame(
        [(1, 10.0), (1, 11.0), (2, 20.0)], "k long, rv double"
    ).createOrReplaceTempView("rsrc")
    lh.execute("CREATE VERSIONED TABLE l AS SELECT * FROM lsrc")
    lh.execute("CREATE VERSIONED TABLE r AS SELECT * FROM rsrc")
    lh.execute(
        "CREATE INCREMENTAL JOIN VIEW lr AS SELECT * FROM l JOIN r USING (k)"
    )
    lh.execute("DELETE FROM VERSIONED r WHERE rv > 10.5")
    lh.execute("REFRESH INCREMENTAL VIEW lr")
    rows = lh.execute("SELECT k, lv, rv, n FROM lr ORDER BY k, rv").collect()
    assert [(r.k, r.rv) for r in rows] == [(1, 10.0)]
    print(f"SQL join view after DELETE: {[(r.k, r.lv, r.rv, r.n) for r in rows]}")
    print("OK")


if __name__ == "__main__":
    main()
