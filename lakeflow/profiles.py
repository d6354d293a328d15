"""Cluster conf profiles: turn (cluster shape, input scale) into Spark conf.

The test harness runs local[32]; production is O(1000) executors over ~100 TB.
The knobs that change between those two worlds are mechanical — shuffle
partition count, memory sizing, state-store backend — so they are computed
here instead of hand-tuned per job. ``SCALE.md`` documents the reasoning.

Usage::

    conf = cluster_profile(executors=1000, cores_per_executor=4,
                           executor_mem_gb=16, input_gb=100_000)
    spark = get_session("prod", extra_conf=conf)
"""

from __future__ import annotations

TARGET_PARTITION_MB = 128  # post-shuffle partition target (fits codegen + spill-free agg)


def cluster_profile(
    executors: int,
    cores_per_executor: int = 4,
    executor_mem_gb: int = 16,
    input_gb: float = 1000.0,
    streaming: bool = False,
) -> dict[str, str]:
    """Recommended conf for a cluster of ``executors`` × ``cores_per_executor``
    reading ~``input_gb`` of data per query.

    Shuffle partitions = max(2 × total cores, input / 128 MiB): every core gets
    ≥2 waves (stragglers amortize), and no partition exceeds the spill-free
    target. AQE coalesces the long tail back, so overshooting is cheap and
    undershooting (hot 10 GB partitions) is the only real failure mode.
    """
    total_cores = executors * cores_per_executor
    by_cores = 2 * total_cores
    by_bytes = int(input_gb * 1024 // TARGET_PARTITION_MB)
    shuffle_partitions = max(by_cores, by_bytes, 1)

    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.files.maxPartitionBytes": str(TARGET_PARTITION_MB * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Split a skewed partition when it exceeds 2× the target size.
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": str(
            2 * TARGET_PARTITION_MB * 1024 * 1024
        ),
        # Broadcast anything under ~1/64 of executor heap: big enough for real
        # dimension tables, small enough that 4 concurrent broadcasts fit.
        "spark.sql.autoBroadcastJoinThreshold": str(
            max(16, executor_mem_gb * 1024 // 64) * 1024 * 1024
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        # Runtime bloom-filter join pruning: when a selective dim filter
        # feeds a shuffle join, inject a bloom filter of the dim keys into
        # the fact scan — rows that cannot match die before the shuffle.
        # On by default in Spark, but gated by size thresholds that assume
        # cluster scale; pin it on so a conf fork can't silently lose the
        # dominant shuffle reducer (behavior pinned by
        # tests/test_plan_shapes.py::test_runtime_bloom_filter_injects).
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    }
    if streaming:
        conf.update(
            {
                # Keyed state at 100 TB/day does not fit on-heap: RocksDB keeps
                # it off-heap with incremental checkpoints to the checkpoint dir.
                "spark.sql.streaming.stateStore.providerClass": (
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider"
                ),
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
                # One state shuffle partition per 2 cores: state ops repartition
                # to this and it cannot be changed without a checkpoint reset,
                # so size it for the target peak, not the first deploy.
                "spark.sql.streaming.statefulOperator.stateRebalancing.enabled": "true",
            }
        )
    return conf


def compaction_policy(
    trigger_seconds: float = 5.0, streamed: bool = True
) -> dict[str, int]:
    """Recommended auto-compaction knobs for the streaming ingest sinks
    (``compact_every_n_batches``/``compact_max_shard_bytes`` on the
    streamed indexes, ``compact_every_n_commits``/``compact_max_small_bytes``
    on the VersionedTable sinks — lakeflow/streaming/sinks.py).

    Two triggers, two failure modes (SCALE.md §5):

    * the COUNT trigger bounds LISTING cost — cap live shards at one hour
      of triggers, clamped to [8, 128]: below 8 the fold runs so often the
      rewrite dominates the ingest; above 128 the probe-side listing is
      still trivial, so more buys nothing while each fold grows.
    * the SIZE trigger bounds fold amplification — fold once the tail
      holds a full ``TARGET_PARTITION_MB`` file's worth of bytes, so every
      fold emits at least one target-size file and a trickle of near-empty
      batches never rewrites dust.

    Whichever fires first folds. Keys are named for the streamed-index
    sinks by default; ``streamed=False`` renames them for the table sinks.
    """
    per_hour = int(3600 / max(trigger_seconds, 0.001))
    every_n = max(8, min(128, per_hour))
    max_bytes = TARGET_PARTITION_MB * 1024 * 1024
    if streamed:
        return {
            "compact_every_n_batches": every_n,
            "compact_max_shard_bytes": max_bytes,
        }
    return {
        "compact_every_n_commits": every_n,
        "compact_max_small_bytes": max_bytes,
    }
