#!/usr/bin/env python
"""Streaming lakehouse hop: CDC feed commits land in a bronze versioned
table; the table-changes stream source reads each commit as a micro-batch
and the APPLY CHANGES sink folds it into silver — incremental across runs
via the shared checkpoint.

    python examples/streaming_cdc.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.sources.table_stream import register_table_changes_source
from lakeflow.streaming.sinks import stream_apply_changes
from lakeflow.tables import VersionedTable


def main() -> None:
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-cdc", master="local[8]", shuffle_partitions=8)
    register_table_changes_source(spark)
    work = tempfile.mkdtemp(prefix="cdc_example_")
    bronze = VersionedTable(spark, f"{work}/bronze")
    silver = VersionedTable(spark, f"{work}/silver")
    ckpt = f"{work}/ckpt"

    def feed(rows):
        return spark.createDataFrame(rows, "k int, seq int, op string, val string")

    def drain():
        stream = (
            spark.readStream.format("lakeflow_table_changes")
            .option("path", bronze.root)
            .load()
        )
        q = stream_apply_changes(
            stream, silver, keys=["k"], seq_col="seq", checkpoint=ckpt
        )
        q.awaitTermination(120)

    bronze.commit(feed([(1, 1, "U", "a"), (2, 1, "U", "b")]))
    drain()
    print("after batch 1:", sorted((r.k, r.val) for r in silver.read().collect()))

    bronze.commit(feed([(1, 2, "U", "a2"), (2, 2, "D", "b"), (3, 1, "U", "c")]))
    drain()
    print("after batch 2:", sorted((r.k, r.val) for r in silver.read().collect()))
    print("silver versions:", silver.versions())
    spark.stop()


if __name__ == "__main__":
    main()
