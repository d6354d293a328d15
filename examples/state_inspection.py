#!/usr/bin/env python
"""Streaming state-store introspection tour (lakeflow/streaming/state_reader.py):
run a stateful streaming aggregation, then — WITHOUT touching the job —
catalog its checkpoint (`state-metadata`), read the live state
(`statestore`), time-travel to an earlier micro-batch's state, and diff the
state against batch truth. The post-incident workflow: "is the state
double-counted, and since which batch?"

    python examples/state_inspection.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.streaming.state_reader import (
    read_aggregation_state,
    read_state_metadata,
    read_state_store,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session(
        "state-inspection", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Two-file feed -> two micro-batches of a running per-type count.
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    feed = tempfile.mkdtemp(prefix="lakeflow-feed-")
    for i in range(2):
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{feed}/b{i}")
    ckpt = tempfile.mkdtemp(prefix="lakeflow-ckpt-")
    stream = spark.readStream.schema(
        "event_id long, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(f"{feed}/b*")
    q = (
        stream.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("by_type")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    print("-- state catalog (operators, stores, committed batch range) --")
    read_state_metadata(spark, ckpt).show(truncate=False)

    print("-- live state vs batch truth (diff must be empty) --")
    state = read_aggregation_state(spark, ckpt).withColumnRenamed(
        "count", "state_n"
    )
    truth = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    diff = state.join(truth, "event_type", "full_outer").filter(
        ~F.col("state_n").eqNullSafe(F.col("n"))
    )
    print("state rows:", state.count(), "| mismatches:", diff.count())

    print("-- time travel: state as of batch 0 (first file only) --")
    read_state_store(spark, ckpt, batch_id=0).select(
        "key.event_type", "value.count"
    ).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
