#!/usr/bin/env python
"""Table-statistics lifecycle tour: ANALYZE → plan from stats → stats go
stale → drift detection → re-ANALYZE → re-plan.

The failure mode this guards at cluster scale: a cost-based planner that
trusts ANALYZE-time row counts will happily broadcast a "small" table that
has since grown 100x — shipping a multi-TB side to every executor. The
reference hard-codes the same decision by hand (a manual ``broadcast()``
on the dimension, src/gold/dim_company.py:34), which goes wrong identically
when the small side grows. lakeflow stores the statistics in the table
manifest (they survive appends — stats go stale, they don't vanish),
detects the drift from metadata-cheap live counts, and re-plans.

    python examples/stats_lifecycle.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators.joins import ndv_planned_join, stats_join_cardinality
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.tables import VersionedTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session(
        "example-stats", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="lakeflow_example_stats_")

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("custkey")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )

    # 1. ANALYZE at ingest time: the fact table starts small.
    fact = VersionedTable(spark, f"{root}/fact")
    fact.commit(orders.filter(F.col("o_orderkey") % 32 == 0))
    fact.analyze_ndv(["custkey"], k=64)
    dim = VersionedTable(spark, f"{root}/dim")
    dim.commit(customer)
    dim.analyze_ndv(["custkey"], k=64)
    print("stored stats:",
          {t: v.ndv_stats("custkey")["rows"] for t, v in
           (("fact", fact), ("dim", dim))})

    # 2. Zero-scan join-cardinality estimate straight off the manifests.
    est = stats_join_cardinality(fact, "custkey", dim, "custkey")
    print(f"plan-time estimate: ~{est['est_join_rows']:.0f} join rows "
          f"(d_fact={est['d_a']:.0f}, d_dim={est['d_b']:.0f})")

    # 3. The rest of the corpus lands WITHOUT re-analysis — stats now lie.
    fact.commit(orders.filter(F.col("o_orderkey") % 32 != 0), mode="append")

    # 4. The drift-guarded planner: stored stats say "broadcast the fact";
    #    the live-count drift check re-ANALYZEs and flips to the dim.
    joined, decision = ndv_planned_join(
        fact, dim, on=["custkey"], broadcast_rows=2 * dim.read().count()
    )
    print("initial (stale) side:", decision["initial_side"],
          f"drift={decision['drift_left']:.0f}x",
          "refreshed:", decision["refreshed"],
          "final side:", decision["final_side"])
    assert decision["initial_side"] == "left"          # the mis-plan
    assert decision["refreshed"] == ["left"]           # the trigger
    assert decision["final_side"] == "right"           # the correction
    print("joined rows:", joined.count())

    # 5. The re-ANALYZE persisted into the manifest: the next plan starts
    #    from fresh statistics and never mis-plans.
    _, second = ndv_planned_join(
        fact, dim, on=["custkey"], broadcast_rows=2 * dim.read().count()
    )
    assert second["initial_side"] == "right" and not second["refreshed"]
    print("second plan: initial side", second["initial_side"],
          "(no re-ANALYZE needed)")

    spark.stop()


if __name__ == "__main__":
    main()
