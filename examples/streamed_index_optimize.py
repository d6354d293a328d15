#!/usr/bin/env python
"""Streamed-index lifecycle tour: micro-batch ingest → probe → shard
accumulation → OPTIMIZE-cadence compaction → identical probe.

Every streaming ingest lands one ``batch=<id>`` subdir per micro-batch —
the subdir is the replay-idempotency key, so exactly-once needs no txn
log. The cost is shard accumulation: a week of 5-second triggers is
~120k subdirs, and directory LISTING becomes the probe bottleneck long
before data volume does. The compactors in
``lakeflow/streaming/compaction.py`` are the OPTIMIZE step: committed
shards fold into one (the newest stays untouched — it is the only batch
a restarted stream can replay), probe answers stay bit-identical, and
per-OPTIMIZE work reads only the shards it folds.

    python examples/streamed_index_optimize.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session(
        "example-stream-optimize", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    from lakeflow.operators.aggregates import (
        cms_cells,
        cms_point_estimate,
        read_cms_cells,
    )
    from lakeflow.operators.similarity import ivf_probe_cells
    from lakeflow.streaming.compaction import (
        _list_batches,
        compact_ann_cells,
        compact_cms_sketch,
    )

    # --- IVF ANN index: vectors arrive in micro-batches -------------------
    raw = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = raw.filter(F.col("vec_id") < 16)
    cells = tempfile.mkdtemp(prefix="lakeflow_example_cells_")

    # Land four "micro-batches" in stream_ann_ingest's exact layout (the
    # streaming engine itself is demonstrated by examples/streaming_cdc.py;
    # here the point is the on-disk lifecycle).
    from pyspark.sql import Window

    from lakeflow.functions.rounding import rnd
    from lakeflow.functions.vectors import dot, norm

    cent = cents.select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("cv_c"),
        norm("embedding").alias("cn_c"),
    )
    for bid in range(4):
        b = raw.filter(F.col("vec_id") % 4 == bid).select(
            F.col("vec_id").alias("vid"), "embedding",
            norm("embedding").alias("vn"),
        )
        s = b.join(F.broadcast(cent)).select(
            "vid", "embedding", "vn", "cid",
            rnd(dot("embedding", "cv_c") / (F.col("vn") * F.col("cn_c")), 6)
            .alias("ccos"),
        )
        w = Window.partitionBy("vid").orderBy(F.desc("ccos"), F.asc("cid"))
        (
            s.withColumn("crn", F.row_number().over(w))
            .filter(F.col("crn") == 1)
            .select("cid", "vid", "embedding", "vn")
            .write.partitionBy("cid")
            .mode("overwrite")
            .parquet(f"{cells}/batch={bid}")
        )
    print("shards after ingest:", _list_batches(cells))

    q = raw.filter(F.col("vec_id") < 5)
    before = sorted(
        map(tuple, ivf_probe_cells(spark, cells, q, cents, k=3).collect())
    )

    folded = compact_ann_cells(spark, cells)
    print(f"OPTIMIZE folded {folded} shards ->", _list_batches(cells))
    after = sorted(
        map(tuple, ivf_probe_cells(spark, cells, q, cents, k=3).collect())
    )
    assert after == before, "compaction must not change probe answers"
    print("ANN probe identical pre/post compaction:", len(after), "rows")

    # --- CMS sketch: partials fold by summing ------------------------------
    orders = load_table(spark, sf_dir, "orders")
    sk = tempfile.mkdtemp(prefix="lakeflow_example_cms_")
    for bid in range(4):
        cms_cells(
            orders.filter(F.col("o_orderkey") % 4 == bid), "o_custkey"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{sk}/cells/batch={bid}"
        )
    probe_keys = orders.select("o_custkey").distinct().limit(5)
    est_before = sorted(
        map(tuple, cms_point_estimate(
            read_cms_cells(spark, sk), probe_keys, "o_custkey"
        ).collect())
    )
    compact_cms_sketch(spark, sk)
    est_after = sorted(
        map(tuple, cms_point_estimate(
            read_cms_cells(spark, sk), probe_keys, "o_custkey"
        ).collect())
    )
    assert est_after == est_before
    print("CMS estimates identical pre/post compaction:", est_after[:3])

    # --- Production path: the sink compacts ITSELF at cadence --------------
    # compact_every_n_batches makes the cadence a policy instead of an
    # operator chore: the fold above runs from inside foreachBatch once
    # more than n shards exist, always keeping the newest for replay.
    import glob
    import shutil

    from lakeflow.sources.streams import file_stream
    from lakeflow.streaming.sinks import stream_cms_ingest

    feed = tempfile.mkdtemp(prefix="lakeflow_example_feed_")
    for bid in range(4):
        part = tempfile.mkdtemp(prefix="lakeflow_example_part_")
        orders.filter(F.col("o_orderkey") % 4 == bid).select(
            "o_custkey"
        ).coalesce(1).write.mode("overwrite").parquet(part)
        dst = f"{feed}/{bid:03d}.parquet"
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + bid,) * 2)
    auto = tempfile.mkdtemp(prefix="lakeflow_example_auto_")
    stream_cms_ingest(
        file_stream(spark, feed, "o_custkey bigint", max_files_per_trigger=1),
        auto,
        "o_custkey",
        compact_every_n_batches=2,
    ).awaitTermination()
    print("auto-compacted shards after 4 micro-batches:",
          _list_batches(f"{auto}/cells"))
    assert len(_list_batches(f"{auto}/cells")) <= 3
    est_auto = sorted(
        map(tuple, cms_point_estimate(
            read_cms_cells(spark, auto), probe_keys, "o_custkey"
        ).collect())
    )
    assert est_auto == est_before, "auto path must match the manual fold"
    print("CMS estimates identical through the AUTO path:", est_auto[:3])

    spark.stop()


if __name__ == "__main__":
    main()
