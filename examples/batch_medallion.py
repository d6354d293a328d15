#!/usr/bin/env python
"""Batch medallion pipeline: CSV landing zone -> bronze -> cleaned silver
(SCD1 dedup) -> gold star-joined dim, run as a topological task DAG.

    python examples/batch_medallion.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from lakeflow.catalog import load_table
from lakeflow.plans.medallion import build_medallion_pipeline
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-medallion", master="local[8]", shuffle_partitions=8)
    work = tempfile.mkdtemp(prefix="medallion_example_")

    # Materialize fixture slices as the CSV landing zone the pipeline ingests.
    load_table(spark, sf_dir, "customer").coalesce(1).write.option(
        "header", True
    ).csv(f"{work}/csv/customer")
    load_table(spark, sf_dir, "nation").coalesce(1).write.option(
        "header", True
    ).csv(f"{work}/csv/nation")

    pipe = build_medallion_pipeline(
        spark, f"{work}/csv/customer", f"{work}/csv/nation", f"{work}/warehouse"
    )
    print("task order:", " -> ".join(pipe.topo_order()))
    results = pipe.run()
    gold = spark.read.parquet(results["gold_dim_customer"])
    print(f"gold_dim_customer rows: {gold.count()}")
    gold.show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
