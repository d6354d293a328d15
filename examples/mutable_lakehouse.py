#!/usr/bin/env python
"""Mutable-lakehouse tour: CHECK constraints gating every DML path,
merge-on-read upsert/delete via deletion vectors, an incremental
materialized view whose refresh prices churn (and folds DV pre-images),
the change-data-feed rendering of MOR commits, and RESTORE.

    python examples/mutable_lakehouse.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.tables import ConstraintViolationError, VersionedTable
from lakeflow.views import IncrementalAggView


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-mutable", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mutable_lakehouse_")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    t = VersionedTable(spark, os.path.join(work, "orders"))
    t.commit(orders.filter(F.col("o_orderkey") <= 1000))
    t.add_constraint("price_positive", "o_totalprice > 0")
    print(f"v{t.current_version()}: seeded with constraint price_positive")

    # The constraint gates every write path — including MOR upsert.
    try:
        t.upsert_mor(
            spark.createDataFrame(
                [(999999, "F", -5.0)],
                "o_orderkey long, o_orderstatus string, o_totalprice double",
            ),
            keys=["o_orderkey"],
        )
        raise SystemExit("breaching upsert must not land")
    except ConstraintViolationError as exc:
        print(f"rejected breaching MOR upsert: {exc}")

    # Incremental MV over the base: refresh IO ∝ churn, not table size.
    mv = IncrementalAggView(
        spark,
        t,
        keys=["o_orderstatus"],
        sums={"sum_cents": ("o_totalprice", 100)},
        path=os.path.join(work, "mv"),
        count_col="n_orders",
    )
    r = mv.refresh()
    print(f"MV built: read {r['dirs_read']}/{r['dirs_total']} dirs")

    # Merge-on-read DML: no data file rewritten, one deletion vector +
    # (for upsert) one appended dir per commit.
    restore_point = t.current_version()
    batch = orders.filter(F.col("o_orderkey").between(1001, 1500)).unionByName(
        orders.filter(F.col("o_orderkey") <= 50).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1.0
        )
    )
    t.upsert_mor(batch, keys=["o_orderkey"])
    t.delete_where_mor("o_orderkey <= 100")
    print(f"v{t.current_version()}: MOR upsert + delete "
          f"({t.detail()['n_delete_vectors']} deletion vectors live)")

    # The refresh folds DV pre-images with sign −1 — no rebuild, and the
    # result is bit-identical to aggregating the base from scratch.
    r = mv.refresh()
    assert r["from_version"] is not None, "must be incremental, not rebuild"
    got = {
        (x.o_orderstatus, x.n_orders, x.sum_cents)
        for x in mv.read().collect()
    }
    want = {
        (x.o_orderstatus, x.n_orders, x.sum_cents)
        for x in t.read()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).cast("bigint").alias("sum_cents"),
        )
        .collect()
    }
    assert got == want, "incremental state diverged from rebuild"
    print(f"MV refreshed incrementally: read {r['dirs_read']}/{r['dirs_total']} "
          f"dirs, state matches from-scratch aggregate ({len(got)} groups)")

    # CDF: inserts from the upsert, deletes from the MOR delete.
    from lakeflow.tables import table_diff

    changes = table_diff(
        t, keys=["o_orderkey"], from_version=restore_point
    )
    kinds = {
        r.change_type: r.n
        for r in changes.groupBy("change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    print(f"CDF between v{restore_point} and v{t.current_version()}: {kinds}")

    # RESTORE rewinds the data (rows resurface in place); the MV detects the
    # vanished vectors and rebuilds.
    t.rollback(restore_point)
    r = mv.refresh()
    assert r["from_version"] is None, "restore past MOR delete must rebuild"
    print(f"restored to v{restore_point}; MV rebuilt "
          f"({r['dirs_read']}/{r['dirs_total']} dirs)")
    spark.stop()


if __name__ == "__main__":
    main()
