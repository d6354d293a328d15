"""State-store introspection (lakeflow/streaming/state_reader.py): the
checkpointed state of a stateful streaming query read back as a DataFrame,
including batchId time travel to earlier micro-batch state."""

from __future__ import annotations

from pyspark.sql import functions as F


def _run_counts(spark, feed, ckpt, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            spark.readStream.schema("k string")
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    q.awaitTermination()


def test_aggregation_state_matches_batch_truth_and_time_travels(
    spark, tmp_path
):
    """Two micro-batches of key counts: latest state == whole-input batch
    aggregation; batchId=0 state == first batch only (the post-incident
    'what did the state look like BEFORE the bad batch' question)."""
    import os

    from lakeflow.streaming.state_reader import (
        read_aggregation_state,
        read_state_store,
    )

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    b0, b1 = ["a", "a", "b"], ["a", "c"]
    for i, rows in enumerate((b0, b1)):
        part = str(tmp_path / f"part{i}")
        spark.createDataFrame(
            [(v,) for v in rows], "k string"
        ).coalesce(1).write.mode("overwrite").parquet(part)
        import glob
        import shutil

        dst = f"{feed}/{i:03d}.parquet"
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i * 10,) * 2)

    ckpt = str(tmp_path / "ckpt")
    _run_counts(spark, feed, ckpt, "state_reader_test")

    latest = {
        (r.k, r["count"])
        for r in read_aggregation_state(spark, ckpt).collect()
    }
    assert latest == {("a", 3), ("b", 1), ("c", 1)}
    at0 = {
        (r.key.k, r.value["count"])
        for r in read_state_store(spark, ckpt, batch_id=0).collect()
    }
    assert at0 == {("a", 2), ("b", 1)}
