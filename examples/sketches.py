#!/usr/bin/env python
"""Mergeable-sketch tour (lakeflow/operators/aggregates.py): the four-leg
family — CMS (frequency), histogram (distribution), KMV (cardinality WITH
set algebra), and the planner application (join-cardinality estimation) —
each maintained as partials that fold losslessly, the regime that keeps
100 TB statistics current without rescanning history.

    python examples/sketches.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators.aggregates import (
    cms_cells,
    cms_point_estimate,
    histogram_partials,
    histogram_quantiles,
    kmv_estimate,
    kmv_join_cardinality,
    kmv_minima,
    kmv_set_ops,
    merge_histograms,
    merge_kmv_minima,
)
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-sketches", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    # -- CMS: frequency ----------------------------------------------------
    keyed = events.select(F.col("user_id").cast("string").alias("user_key"))
    cells = cms_cells(keyed, "user_key")
    hot = (
        cms_point_estimate(cells, keyed.distinct(), "user_key")
        .orderBy(F.desc("est_cnt"))
        .limit(3)
    )
    print("CMS heaviest users (est):", [tuple(r) for r in hot.collect()])

    # -- Histogram: distribution, partials fold by summing ------------------
    parts = histogram_partials(
        events, "value", width=5.0,
        part_cols=[F.dayofmonth("ts").alias("day")],
    )
    merged = merge_histograms(parts)
    qs = histogram_quantiles(merged, [0.5, 0.99], width=5.0)
    print("histogram p50/p99 from per-day partials:",
          {r["q"]: r["approx_value"] for r in qs.collect()})

    # -- KMV: cardinality with set algebra ----------------------------------
    k = 64
    by_type = kmv_minima(events, "user_id", k, group_cols=["event_type"])
    print("KMV distinct users per event type:")
    for r in kmv_estimate(by_type, k, group_cols=["event_type"]).orderBy(
        "event_type"
    ).collect():
        print(f"  {r['event_type']}: ~{r['est_distinct']}")

    # merge partials (e.g. per-day sketches) back to the one-pass sketch
    daily = kmv_minima(
        events.withColumn("day", F.dayofmonth("ts")),
        "user_id", k, group_cols=["day"],
    )
    folded = merge_kmv_minima(daily.select("u"), k)
    direct = kmv_minima(events, "user_id", k)
    assert sorted(r["u"] for r in folded.collect()) == sorted(
        r["u"] for r in direct.collect()
    ), "per-day partials must fold to EXACTLY the one-pass sketch"
    print("per-day KMV partials fold losslessly: True")

    # set algebra across two sketches, never re-touching the data
    buyers = kmv_minima(
        events.filter(F.col("event_type") == "purchase"), "user_id", k
    )
    clickers = kmv_minima(
        events.filter(F.col("event_type") == "click"), "user_id", k
    )
    print("buyers vs clickers:",
          [tuple(r) for r in kmv_set_ops(buyers, clickers, k).collect()])

    # -- Planner application: join-rows estimate from sketches --------------
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    est = kmv_join_cardinality(orders, "o_custkey", cust, "c_custkey", 256)
    exact = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).count()
    row = est.collect()[0]
    print(f"join cardinality: est {row['est_join_rows']:.0f} vs exact {exact}")


if __name__ == "__main__":
    main()
