"""Pushdown table DataSource (lakeflow/sources/table_source.py): the
Murmur3 twin must be bit-exact with F.hash (a divergence would over-prune
bucket lookups), planning must prune only provably-empty files, and the
Arrow read path must reproduce VersionedTable.read() exactly — deletion
vectors, schema evolution and identity partitions included."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakeflow.sources.table_source import (
    _ordered_transform_bounds,
    murmur3_hash_int,
    murmur3_hash_long,
    plan_files,
    register_table_source,
)
from lakeflow.tables import VersionedTable


def _rows(df):
    df = df.select(*sorted(df.columns))  # driver-style name-ordered compare
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_murmur3_twin_matches_spark_hash(spark):
    """The Python hash twin vs F.hash over negatives, zero, both widths —
    the ONLY safe bucket pruning is a bit-exact one."""
    vals = [0, 1, -1, 7, -37, 2**31 - 1, -(2**31), 2**62, -(2**62), 123456789]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", F.hash("v").alias("h")
    )
    got = {r.v: r.h for r in df.collect()}
    for v in vals:
        assert murmur3_hash_long(v) == got[v], f"long twin diverged at {v}"
    ints = [0, 1, -1, 42, -999, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in ints], "v int").select(
        "v", F.hash("v").alias("h")
    )
    got = {r.v: r.h for r in df.collect()}
    for v in ints:
        assert murmur3_hash_int(v) == got[v], f"int twin diverged at {v}"


def test_roundtrip_plain_and_dv_masked(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
        )
    )
    register_table_source(spark)
    src = spark.read.format("lakeflow_table").option("path", t.root).load()
    assert _rows(src) == _rows(t.read())

    # Merge-on-read delete: the source must apply the deletion vector.
    t.delete_where_mor("k % 7 = 0")
    src = spark.read.format("lakeflow_table").option("path", t.root).load()
    assert _rows(src) == _rows(t.read())
    assert src.count() == t.read().count() != 100


def test_schema_evolution_and_identity_partitions(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"),
        partition_by=["s"],
    )
    t.commit(
        spark.createDataFrame(
            [(3, "c", 9.5)], "k long, s string, extra double"
        ),
        partition_by=["s"],
        merge_schema=True,
    )
    register_table_source(spark)
    src = spark.read.format("lakeflow_table").option("path", t.root).load()
    assert _rows(src) == _rows(t.read())
    assert set(src.columns) == {"k", "s", "extra"}


def test_time_travel_option(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.range(0, 5).select(F.col("id").alias("k")))
    t.commit(spark.range(5, 9).select(F.col("id").alias("k")))
    register_table_source(spark)
    v1 = (
        spark.read.format("lakeflow_table")
        .option("path", t.root)
        .option("version", "1")
        .load()
    )
    assert v1.count() == 5


def test_plan_prunes_stats_bloom_and_transforms(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    rows = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.expr(
            "CAST(date_add(DATE'2024-01-01', CAST(id % 365 AS INT)) AS timestamp)"
        ).alias("ts"),
    )
    # Four key-banded commits with stats + bloom + transform partitioning.
    for i in range(4):
        t.commit(
            rows.filter((F.col("k") >= i * 100) & (F.col("k") < (i + 1) * 100)),
            stats_cols=["k"],
            bloom_cols=["k"],
            partition_by=["month(ts)", "bucket(4, k)"],
        )
    types = {"k": "bigint", "ts": "timestamp"}
    all_files, _m = plan_files(t.root, None, {}, {}, types)
    assert len(all_files) > 4

    # Range on k: zone maps keep one band's dirs only.
    band, _m = plan_files(t.root, None, {}, {"k": [150, 160]}, types)
    assert {f["dir"] for f in band} < {f["dir"] for f in all_files}
    assert len({f["dir"] for f in band}) == 1

    # Equality on k: bloom + bucket twin prune within the band too.
    point, _m = plan_files(t.root, None, {"k": 155}, {}, types)
    assert len(point) < len(band)
    import datetime

    # Month transform prunes by the ts range (±1 day widening tolerated).
    lo = datetime.datetime(2024, 6, 1)
    hi = datetime.datetime(2024, 6, 30)
    months, _m = plan_files(t.root, None, {}, {"ts": [lo, hi]}, types)
    assert 0 < len(months) < len(all_files)

    # End-to-end: the pruned read still returns exactly the right rows.
    register_table_source(spark)
    src = (
        spark.read.format("lakeflow_table")
        .option("path", t.root)
        .load()
        .filter((F.col("k") == 155) & F.col("ts").between(lo, hi))
    )
    exp = t.read().filter((F.col("k") == 155) & F.col("ts").between(lo, hi))
    assert _rows(src) == _rows(exp)


def test_pushdown_equality_correctness_sweep(spark, tmp_path):
    """Bucket pruning is only as safe as the hash twin: sweep many point
    lookups through the full source path and compare against the plain
    read — a single missing row means the twin (or segment parsing) lies."""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 60).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("g")
        ),
        partition_by=["bucket(8, k)"],
    )
    register_table_source(spark)
    base = spark.read.format("lakeflow_table").option("path", t.root).load()
    for k in [0, 1, 7, 13, 29, 42, 59]:
        assert base.filter(F.col("k") == k).count() == 1, f"k={k} lost"


def test_governed_and_renamed_tables_refused(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(spark.createDataFrame([(1, "x")], "k long, s string"))
    t.set_column_mask("s", "'***'")
    register_table_source(spark)
    with pytest.raises(Exception, match="governed"):
        spark.read.format("lakeflow_table").option("path", t.root).load().collect()

    t2 = VersionedTable(spark, str(tmp_path / "t2"))
    t2.commit(spark.createDataFrame([(1, "x")], "k long, s string"))
    t2.rename_column("s", "s2")
    with pytest.raises(Exception, match="renamed"):
        spark.read.format("lakeflow_table").option("path", t2.root).load().collect()


def test_ordered_transform_bounds_widening():
    import datetime

    lo = datetime.datetime(2024, 1, 1)
    hi = datetime.datetime(2024, 1, 2)
    # Year widening spans the boundary: Dec 31 is admitted.
    t_lo, t_hi = _ordered_transform_bounds("year", None, lo, hi)
    assert t_lo == 2023 and t_hi == 2024
    t_lo, t_hi = _ordered_transform_bounds("month", None, lo, hi)
    assert t_lo == (2023 - 1970) * 12 + 11 and t_hi == (2024 - 1970) * 12 + 0
    assert _ordered_transform_bounds("truncate", 2, "ab", "ax") == ("ab", "ax")
    assert _ordered_transform_bounds("year", None, None, hi) is None


def test_writer_append_and_overwrite_roundtrip(spark, tmp_path):
    """df.write.format('lakeflow_table'): task-parallel shard writes +
    manifest publish with merged zone maps; append preserves history and
    overwrite starts the dir list fresh (older versions stay readable)."""
    register_table_source(spark)
    root = str(tmp_path / "t")
    df1 = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    df1.write.format("lakeflow_table").option("path", root).mode(
        "append"
    ).save()
    t = VersionedTable(spark, root)
    assert t.current_version() == 1
    assert _rows(t.read()) == _rows(df1)

    df2 = spark.range(50, 80).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    df2.write.format("lakeflow_table").option("path", root).mode(
        "append"
    ).save()
    assert t.read().count() == 80
    # Writer-recorded zone maps engage the same pruning as stats_cols.
    assert t.pruned_dirs({"k": (60, 70)}) >= 1

    df2.write.format("lakeflow_table").option("path", root).mode(
        "overwrite"
    ).save()
    assert t.read().count() == 30
    assert t.read(version=2).count() == 80  # time travel intact


def test_writer_refuses_schema_drift_and_constraints(spark, tmp_path):
    register_table_source(spark)
    root = str(tmp_path / "t")
    spark.range(0, 5).select(F.col("id").alias("k")).write.format(
        "lakeflow_table"
    ).option("path", root).mode("append").save()
    with pytest.raises(Exception, match="write schema"):
        spark.range(0, 5).select(F.col("id").alias("OTHER")).write.format(
            "lakeflow_table"
        ).option("path", root).mode("append").save()

    t = VersionedTable(spark, str(tmp_path / "tc"))
    t.commit(spark.createDataFrame([(1.0,)], "v double"))
    t.add_constraint("pos", "v > 0")
    with pytest.raises(Exception, match="constraints"):
        spark.createDataFrame([(2.0,)], "v double").write.format(
            "lakeflow_table"
        ).option("path", t.root).mode("append").save()
    # The refused write must not have leaked a manifest (add_constraint
    # itself published v2; the write attempt must not add a v3).
    assert t.current_version() == 2


def test_writer_roundtrips_through_reader_with_dvs(spark, tmp_path):
    """Full circle: python-written table, JVM MOR delete, python read —
    all three surfaces agree."""
    register_table_source(spark)
    root = str(tmp_path / "t")
    spark.range(0, 40).select(F.col("id").alias("k")).write.format(
        "lakeflow_table"
    ).option("path", root).mode("append").save()
    t = VersionedTable(spark, root)
    t.delete_where_mor("k % 4 = 0")
    src = spark.read.format("lakeflow_table").option("path", root).load()
    assert _rows(src) == _rows(t.read())
    assert src.count() == 30


def test_stream_writer_exactly_once(spark, tmp_path):
    """writeStream.format('lakeflow_table'): one snapshot per micro-batch,
    txn-watermarked so a replayed batch publishes nothing twice."""
    src = str(tmp_path / "src")
    spark.range(0, 10).select(F.col("id").alias("k")).coalesce(1).write.parquet(
        src, mode="overwrite"
    )
    spark.range(10, 25).select(F.col("id").alias("k")).coalesce(1).write.parquet(
        src, mode="append"
    )
    register_table_source(spark)
    root = str(tmp_path / "t")
    q = (
        spark.readStream.schema("k bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("lakeflow_table")
        .option("path", root)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    t = VersionedTable(spark, root)
    assert t.read().count() == 25
    assert t.current_version() >= 2  # one snapshot per micro-batch
    m = t._manifest(t.current_version())
    assert "lakeflow_pystream" in m.get("txns", {})

    # Re-running from the SAME checkpoint finds no new files: no snapshot.
    v = t.current_version()
    q2 = (
        spark.readStream.schema("k bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.format("lakeflow_table")
        .option("path", root)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert t.current_version() == v


def test_stream_writer_replayed_batch_is_skipped(spark, tmp_path):
    """Direct replay of commit(messages, batchId): the txn watermark must
    swallow the duplicate publish and sweep the re-written shards."""
    import pyarrow as pa

    from lakeflow.sources.table_source import (
        LakeflowTableStreamWriter,
        _ShardCommit,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    root = str(tmp_path / "t")
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    schema = StructType([StructField("k", LongType())])
    w = LakeflowTableStreamWriter(root, schema, "app1")

    def shard(vals):
        batch = pa.RecordBatch.from_pydict({"k": vals})
        return w.write(iter([batch]))

    w.commit([shard([1, 2, 3])], batchId=0)
    t = VersionedTable(spark, root)
    assert t.read().count() == 3 and t.current_version() == 1
    # Replay batch 0 (crash between commit and checkpoint): no-op.
    w.commit([shard([1, 2, 3])], batchId=0)
    assert t.read().count() == 3 and t.current_version() == 1
    # Batch 1 proceeds normally.
    w.commit([shard([4, 5])], batchId=1)
    assert t.read().count() == 5 and t.current_version() == 2



def test_sql_route_via_temp_view_pushes_down(spark, tmp_path):
    """SQL route: a temp view over the loaded source keeps the relation in
    every query's plan, so pushFilters runs per query and a plain SQL WHERE
    prunes — no DataFrame API at query time. (CREATE TABLE ... USING a
    Python data source does not forward OPTIONS to the reader in Spark
    4.1, so the catalog-table route is out of reach for now.)"""
    t = VersionedTable(spark, str(tmp_path / "t"))
    t.commit(
        spark.range(0, 30).select(
            F.col("id").alias("k"), (F.col("id") * 3.0).alias("v")
        )
    )
    register_table_source(spark)
    spark.read.format("lakeflow_table").option("path", t.root).load(
    ).createOrReplaceTempView("sql_lft")
    got = spark.sql(
        "SELECT k, v FROM sql_lft WHERE k BETWEEN 5 AND 7 ORDER BY k"
    ).collect()
    assert [(r.k, r.v) for r in got] == [(5, 15.0), (6, 18.0), (7, 21.0)]
