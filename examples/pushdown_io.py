#!/usr/bin/env python
"""Pushdown DataSource tour: the `lakeflow_table` format end-to-end —
write a versioned table with plain `df.write`, read it back with plain
`df.read` + a filter that prunes manifest metadata (zone maps, blooms,
partition-transform path segments), and stream into it exactly-once.

    python examples/pushdown_io.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.sources.table_source import plan_files, register_table_source
from lakeflow.tables import VersionedTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-pushdown", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    register_table_source(spark)
    work = tempfile.mkdtemp(prefix="pushdown_io_")

    # -- write: plain df.write, two appends --------------------------------
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    root = os.path.join(work, "orders")
    half = orders.agg(F.max("o_orderkey")).collect()[0][0] // 2
    orders.filter(F.col("o_orderkey") <= half).write.format(
        "lakeflow_table"
    ).option("path", root).mode("append").save()
    orders.filter(F.col("o_orderkey") > half).write.format(
        "lakeflow_table"
    ).option("path", root).mode("append").save()
    t = VersionedTable(spark, root)
    print(f"wrote {t.read().count()} rows across {t.current_version()} snapshots")

    # -- read: plain filter, manifest pruning ------------------------------
    types = {"o_orderkey": "bigint", "o_custkey": "bigint"}
    all_files, _ = plan_files(root, None, {}, {}, types)
    kept, _ = plan_files(root, None, {}, {"o_orderkey": [0, half // 2]}, types)
    assert len(kept) < len(all_files)
    got = (
        spark.read.format("lakeflow_table")
        .option("path", root)
        .load()
        .filter(F.col("o_orderkey") <= half // 2)
    )
    exp = t.read().filter(F.col("o_orderkey") <= half // 2)
    assert got.count() == exp.count()
    print(
        f"filtered read planned {len(kept)}/{len(all_files)} files, "
        f"{got.count()} rows (exact)"
    )

    # -- stream: exactly-once micro-batch appends --------------------------
    src = os.path.join(work, "feed")
    spark.range(0, 20).select(F.col("id").alias("k")).coalesce(1).write.parquet(src)
    stream_root = os.path.join(work, "stream_t")
    q = (
        spark.readStream.schema("k bigint")
        .parquet(src)
        .writeStream.format("lakeflow_table")
        .option("path", stream_root)
        .option("checkpointLocation", os.path.join(work, "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    st = VersionedTable(spark, stream_root)
    m = st._manifest(st.current_version())
    assert "lakeflow_pystream" in m.get("txns", {})
    print(
        f"streamed {st.read().count()} rows; batch watermark "
        f"{m['txns']['lakeflow_pystream']} rides the manifest"
    )
    print("OK")


if __name__ == "__main__":
    main()
