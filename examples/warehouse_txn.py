#!/usr/bin/env python
"""Multi-table transaction tour (lakeflow/txn.py): atomic silver+gold
publishes through the catalog commit log, a torn transaction that stays
invisible, snapshot-isolated in-flight reads, cross-table time travel,
whole-warehouse fork/merge, and the SQL statement surface for the same.

    python examples/warehouse_txn.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.sqlx import LakehouseSQL
from lakeflow.tables import TableCatalog
from lakeflow.txn import CatalogRef


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-txn", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    catalog = TableCatalog(spark, tempfile.mkdtemp(prefix="wh_txn_"))
    main_ref = CatalogRef(spark, catalog)

    # -- 1. silver + gold land ATOMICALLY ---------------------------------
    def gold_of(df):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("revenue"),
        )

    with main_ref.transaction("epoch 1") as txn:
        txn.write("silver", orders.filter(F.col("o_orderkey") <= 2000))
        txn.write("gold", gold_of(txn.read("silver")))
    print("epoch 1 state:", main_ref.state())

    # -- 2. a torn transaction publishes NOTHING --------------------------
    torn = main_ref.transaction("torn epoch")
    torn.write(
        "silver",
        orders.filter(F.col("o_orderkey") > 2000),
        mode="append",
    )
    # ...crash here: no torn.commit(). Catalog readers still see epoch 1,
    # and silver+gold stay mutually consistent.
    n_silver = main_ref.read("silver").count()
    n_gold_src = (
        main_ref.read("gold").agg(F.sum("n")).collect()[0][0]
    )
    print(f"after torn txn: silver={n_silver} rows, gold covers={n_gold_src}")
    assert n_silver == n_gold_src

    # -- 3. cross-table time travel ---------------------------------------
    with main_ref.transaction("epoch 2") as txn:
        txn.write(
            "silver", orders.filter(F.col("o_orderkey") > 2000), mode="append"
        )
        txn.write("gold", gold_of(txn.read("silver")), mode="overwrite")
    for commit in main_ref.commits():
        pair = (
            main_ref.read("silver", commit=commit).count(),
            main_ref.read("gold", commit=commit).agg(F.sum("n")).collect()[0][0],
        )
        print(f"warehouse @ commit {commit}: silver rows == gold cover: {pair}")

    # -- 4. whole-warehouse fork + merge ----------------------------------
    dev = main_ref.fork("dev")
    with dev.transaction("dev experiment") as txn:
        txn.write(
            "experiments",
            main_ref.read("gold").withColumn("boost", F.col("revenue") * 1.1),
        )
    merge_commit = main_ref.merge_from(dev)
    print(
        f"merged dev@{dev.current_commit()} into main as commit "
        f"{merge_commit}: {sorted(main_ref.state())}"
    )

    # -- 5. the same through SQL ------------------------------------------
    lh = LakehouseSQL(
        spark, TableCatalog(spark, tempfile.mkdtemp(prefix="wh_sql_"))
    )
    orders.createOrReplaceTempView("src_orders")
    lh.execute("BEGIN TRANSACTION 'sql epoch'")
    lh.execute(
        "CREATE VERSIONED TABLE silver AS "
        "SELECT o_orderkey, o_orderstatus FROM src_orders "
        "WHERE o_orderkey <= 1000"
    )
    lh.execute(
        "CREATE VERSIONED TABLE gold AS "
        "SELECT o_orderstatus, count(*) AS n FROM src_orders "
        "WHERE o_orderkey <= 1000 GROUP BY o_orderstatus"
    )
    result = lh.execute("COMMIT")
    print("SQL txn landed:", result)
    lh.execute("DESCRIBE CATALOG LOG").show(truncate=False)


if __name__ == "__main__":
    main()
