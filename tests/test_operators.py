"""Unit tests for operator semantics not fully covered by the oracle suite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakeflow.operators.merge import scd1_apply, scd2_apply
from lakeflow.operators.multimodal import decode_image_real
from lakeflow.operators.transforms import (
    dedup_latest,
    handle_nulls,
    normalize_schema,
    nullify_nonpositive,
    rename_cols,
    trim_strings,
)
from lakeflow.plans.runner import Pipeline
from lakeflow.sources.batch import incremental_read

from .conftest import slow_lane


def test_normalize_schema_adds_missing_and_keeps_or_drops_extra(spark):
    df = spark.createDataFrame([("1", "a", "x")], ["k", "v", "extra"])
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("missing", DoubleType()),
        ]
    )
    kept = normalize_schema(df, schema, keep_extra=True)
    assert kept.columns == ["k", "v", "missing", "extra"]
    assert dict(kept.dtypes)["k"] == "bigint"
    assert kept.collect()[0]["missing"] is None

    dropped = normalize_schema(df, schema, keep_extra=False)
    assert dropped.columns == ["k", "v", "missing"]


def test_cleaning_chain(spark):
    df = spark.createDataFrame(
        [(1, "  a  ", -5.0), (2, "b", 3.0), (None, "c", 1.0)],
        StructType(
            [
                StructField("k", IntegerType()),
                StructField("s", StringType()),
                StructField("x", DoubleType()),
            ]
        ),
    )
    out = handle_nulls(
        nullify_nonpositive(trim_strings(df, ["s"]), ["x"]),
        drop_subset=["k"],
        fill={"x": 0.0},
    ).orderBy("k")
    rows = out.collect()
    assert [r["s"] for r in rows] == ["a", "b"]
    assert rows[0]["x"] == 0.0  # -5 → NULL → filled 0
    assert rows[1]["x"] == 3.0


def test_rename_cols(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    assert rename_cols(df, {"a": "x", "b": "y"}).columns == ["x", "y"]


def test_dedup_latest_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 10, 100), (1, 10, 200), (1, 5, 300), (2, 7, 400)],
        ["k", "ord", "payload"],
    )
    out = dedup_latest(df, ["k"], "ord", tiebreak_cols=["payload"]).orderBy("k")
    rows = out.collect()
    assert [(r["k"], r["payload"]) for r in rows] == [(1, 200), (2, 400)]


def test_scd1_upsert(spark):
    target = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    source = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    out = {(r["k"], r["v"]) for r in scd1_apply(target, source, ["k"]).collect()}
    assert out == {(1, "a"), (2, "B"), (3, "c")}


def test_scd2_phases(spark):
    target = spark.createDataFrame(
        [(1, "a", "2026-01-01 00:00:00", None, 1), (2, "b", "2026-01-01 00:00:00", None, 1)],
        StructType(
            [
                StructField("k", LongType()),
                StructField("v", StringType()),
                StructField("start_timestamp", StringType()),
                StructField("end_timestamp", StringType()),
                StructField("is_current", IntegerType()),
            ]
        ),
    ).withColumns(
        {
            "start_timestamp": F.col("start_timestamp").cast("timestamp"),
            "end_timestamp": F.col("end_timestamp").cast("timestamp"),
        }
    )
    source = spark.createDataFrame([(1, "A"), (3, "c")], ["k", "v"])
    out = scd2_apply(target, source, ["k"], ["v"], "2026-02-01 00:00:00")
    rows = {(r["k"], r["v"], r["is_current"]) for r in out.collect()}
    # 1/a expired, 1/A new current, 2/b untouched current, 3/c new current
    assert rows == {(1, "a", 0), (1, "A", 1), (2, "b", 1), (3, "c", 1)}
    expired = [r for r in out.collect() if r["k"] == 1 and r["is_current"] == 0][0]
    assert str(expired["end_timestamp"]) == "2026-02-01 00:00:00"


def test_incremental_read_high_watermark(spark):
    src = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], ["k", "wm"])
    tgt = spark.createDataFrame([(1, 10), (2, 20)], ["k", "wm"])
    assert incremental_read(src, None, "wm").count() == 3
    assert incremental_read(src, tgt.limit(0), "wm").count() == 3
    got = incremental_read(src, tgt, "wm").collect()
    assert [(r["k"], r["wm"]) for r in got] == [(3, 30)]


def test_pipeline_topo_and_diamond():
    pipe = Pipeline("t")
    order = []

    @pipe.task("a")
    def a(res):
        order.append("a")
        return 1

    @pipe.task("b", deps=["a"])
    def b(res):
        order.append("b")
        return res["a"] + 1

    @pipe.task("c", deps=["a"])
    def c(res):
        order.append("c")
        return res["a"] + 10

    @pipe.task("d", deps=["b", "c"])
    def d(res):
        order.append("d")
        return res["b"] + res["c"]

    results = pipe.run()
    assert results["d"] == 13
    assert order[0] == "a" and order[-1] == "d"


def test_pipeline_cycle_detection():
    pipe = Pipeline("cyc")
    pipe.task("x", deps=["y"])(lambda res: None)
    pipe.task("y", deps=["x"])(lambda res: None)
    with pytest.raises(ValueError, match="cycle"):
        pipe.topo_order()


def test_multimodal_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_stateful_gap_sessionization(spark, tmp_path):
    """applyInPandasWithState sessions match batch-computed gap sessions for
    every session that is provably closed (a later event exists for the key)."""
    import pandas as pd

    from lakeflow.sources.streams import file_stream
    from lakeflow.streaming.sinks import run_to_memory
    from lakeflow.streaming.stateful import sessionize_stream

    from datetime import datetime, timedelta

    rows = []
    base = datetime(2024, 1, 1, 0, 0, 0)
    # user 1: two sessions (gap 45 min between event 2 and 3), then a closer
    for i, off in enumerate([0, 10, 55, 60, 200]):
        rows.append((base + timedelta(minutes=off), 1, float(i + 1)))
    # user 2: single session then a far-away closer event
    for i, off in enumerate([0, 5, 120]):
        rows.append((base + timedelta(minutes=off), 2, 10.0 * (i + 1)))
    src = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    path = str(tmp_path / "ev")
    src.coalesce(1).write.parquet(path)

    schema = spark.read.parquet(path).schema
    stream = spark.readStream.schema(schema).parquet(path)
    sessions = sessionize_stream(stream, gap="30 minutes", watermark="1 minutes")
    name, _ = run_to_memory(sessions)
    got = {
        (r.user_id, r.session_start.isoformat(), r.n_events, r.total_value)
        for r in spark.table(name).collect()
    }
    # user 1: [0,10] closed by 55; [55,60] closed by 200. user 2: [0,5] closed by 120.
    expected = {
        (1, "2024-01-01T00:00:00", 2, 3.0),
        (1, (base + pd.Timedelta(minutes=55)).isoformat(), 2, 7.0),
        (2, "2024-01-01T00:00:00", 2, 30.0),
    }
    assert expected <= got


def test_stateful_sessionizer_survives_cross_chunk_disorder(spark, tmp_path):
    """A key whose micro-batch rows span several Arrow chunks receives the
    chunks in partition order, not time order. Feed one user's events
    pre-sorted DESCENDING with a small Arrow batch size so later chunks
    hold EARLIER events: per-chunk sorting alone (the pre-r10 code) sees
    time regress at every chunk boundary and splits the run into bogus
    sessions; the concat-before-sort form must emit exactly one closed
    session covering all events."""
    from datetime import datetime, timedelta

    from lakeflow.streaming.sinks import run_to_memory
    from lakeflow.streaming.stateful import sessionize_stream

    base = datetime(2024, 1, 1)
    n = 1500
    rows = [(base + timedelta(seconds=10 * i), 1, 1.0) for i in range(n)]
    rows.append((base + timedelta(days=1), 1, 0.0))  # closes the session
    rows.sort(key=lambda r: r[0], reverse=True)
    src = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
    path = str(tmp_path / "ev_desc")
    src.coalesce(1).write.parquet(path)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
    try:
        stream = spark.readStream.schema(
            spark.read.parquet(path).schema
        ).parquet(path)
        sessions = sessionize_stream(stream, gap="30 minutes", watermark="1 minutes")
        name, _ = run_to_memory(sessions)
        got = [
            (r.session_start.isoformat(), r.n_events, r.total_value)
            for r in spark.table(name).filter("user_id = 1").collect()
        ]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == [("2024-01-01T00:00:00", n, float(n))], got


def test_salted_join_matches_plain_join(spark):
    from lakeflow.operators.joins import salted_join

    fact = spark.createDataFrame(
        [(i % 3, float(i)) for i in range(300)], "k int, v double"
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")
    plain = {(r.k, r.v, r.name) for r in fact.join(dim, ["k"]).collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(fact, dim, ["k"], n_salts=4).collect()}
    assert salted == plain and len(salted) == 300


def test_salted_two_phase_agg_matches_plain(spark):
    from lakeflow.operators.aggregates import salted_two_phase_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i % 5, float(i), i) for i in range(1000)], "k int, v double, c long"
    )
    got = {
        (r.k, r.sum_v, r.count_c, r.max_v)
        for r in salted_two_phase_agg(df, ["k"], {"v": "sum", "c": "count"})
        .join(
            df.groupBy("k").agg(F.max("v").alias("max_v")), ["k"]
        )
        .collect()
    }
    want = {
        (r.k, r.sum_v, r.count_c, r.max_v)
        for r in df.groupBy("k")
        .agg(
            F.sum("v").alias("sum_v"),
            F.count("c").alias("count_c"),
            F.max("v").alias("max_v"),
        )
        .collect()
    }
    assert got == want


def test_cluster_profile_scales_with_shape():
    from lakeflow.profiles import cluster_profile

    small = cluster_profile(executors=4, cores_per_executor=4, input_gb=10)
    big = cluster_profile(executors=1000, cores_per_executor=4, input_gb=100_000)
    assert int(small["spark.sql.shuffle.partitions"]) == 80  # 10 GiB / 128 MiB
    assert int(big["spark.sql.shuffle.partitions"]) == 800_000
    assert "stateStore" not in str(small)
    stream = cluster_profile(executors=10, streaming=True)
    assert "RocksDBStateStoreProvider" in str(stream)


def test_resize_images_plumbing(spark):
    from lakeflow.operators.multimodal import attach_binary_payload, resize_images

    docs = spark.createDataFrame([(1, "hello world"), (2, "x" * 5000)], ["doc_id", "text"])
    out = resize_images(attach_binary_payload(docs), width=8, height=4).collect()
    assert {(r.media_id, r.width, r.height, len(r.payload)) for r in out} == {
        (1, 8, 4, 32),
        (2, 8, 4, 32),
    }
    # deterministic across runs
    again = resize_images(attach_binary_payload(docs), width=8, height=4).collect()
    assert {bytes(r.payload) for r in out} == {bytes(r.payload) for r in again}


def test_jsonl_corrupt_lines_are_quarantined(spark, tmp_path):
    """PERMISSIVE JSONL read: bad lines land in _corrupt_record, good rows
    survive — the web-corpus ingestion default."""
    from lakeflow.sources.batch import read_jsonl

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n{"doc_id": 2, "text": "fine"}\n')
    df = read_jsonl(
        spark, str(p), "doc_id bigint, text string, _corrupt_record string"
    ).cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert {r.doc_id for r in good.collect()} == {1, 2}
    assert bad.count() == 1
    df.unpersist()


def test_binary_file_source_feeds_multimodal(spark, tmp_path):
    """binaryFile source → multimodal metadata extraction end-to-end."""
    from pyspark.sql import functions as F

    from lakeflow.operators.multimodal import extract_media_meta
    from lakeflow.sources.batch import read_binary_files

    (tmp_path / "a.png").write_bytes(b"\x89PNG fake one")
    (tmp_path / "b.jpg").write_bytes(b"\xff\xd8 fake two longer payload")
    (tmp_path / "skip.txt").write_text("not media")
    media = read_binary_files(spark, str(tmp_path), glob="*.{png,jpg}")
    assert media.count() == 2
    prepared = media.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        F.col("content").alias("payload"),
    )
    meta = extract_media_meta(prepared).collect()
    assert {m.byte_len for m in meta} == {13, 26}
    assert all(len(m.checksum) == 32 for m in meta)


def test_ml_minhash_recalls_exact_near_dups(spark):
    """MLlib MinHashLSH candidates must recall the exact high-similarity pairs
    (token-set Jaccard >= 0.5) found by brute force on a small corpus with
    planted near-duplicates."""
    from lakeflow.operators.similarity import ml_minhash_pairs

    base = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
        (4, "completely different text about spark engines today"),
        (5, "unrelated single sentence nothing shared here"),
    ]
    docs = spark.createDataFrame(base, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in ml_minhash_pairs(docs, jaccard_max_distance=0.6).collect()
    }
    # exact token-set Jaccard >= 0.5 pairs: (1,2) and (3,4)
    assert {(1, 2), (3, 4)} <= pairs
    assert (1, 5) not in pairs and (2, 3) not in pairs


def test_write_table_sorted_rowgroups(spark, tmp_path):
    """sort_by produces per-file sorted data (row-group skipping layout)."""
    from lakeflow.plans.medallion import write_table

    df = spark.createDataFrame([(i % 97, i) for i in range(500)], "k int, v int")
    path = write_table(df.repartition(2), str(tmp_path / "t"), mode="overwrite", sort_by=["k"])
    import pyarrow.parquet as pq
    import glob as g

    for f in g.glob(path + "/*.parquet"):
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks)


def test_stratified_sample_fate_is_stable_under_increment(spark):
    """A row's sample fate must not change when the corpus grows (incremental
    ingestion) or when per-stratum rates of OTHER strata change."""
    from lakeflow.operators.transforms import stratified_hash_sample

    full = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)], "id long, lang string"
    )
    first_half = full.filter(F.col("id") < 150)
    rates = {"en": 0.3, "de": 0.9}
    kept_full = {
        r.id for r in stratified_hash_sample(full, "id", "lang", rates).collect()
    }
    kept_half = {
        r.id
        for r in stratified_hash_sample(first_half, "id", "lang", rates).collect()
    }
    assert kept_half == {i for i in kept_full if i < 150}

    # changing the de rate must not disturb en fates
    kept_en_only = {
        r.id
        for r in stratified_hash_sample(
            full.filter(F.col("lang") == "en"), "id", "lang", {"en": 0.3, "de": 0.1}
        ).collect()
    }
    assert kept_en_only == {
        i for i in kept_full if i % 3 != 0
    }


def test_quality_filter_reasons(spark):
    from lakeflow.operators.text import quality_filter

    docs = spark.createDataFrame(
        [
            (1, "the of and is in " * 30),  # long, alphabetic, stopword-rich
            (2, "short text"),  # too few tokens
            (3, "1234 5678 9012 " * 20),  # numeric
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.keep, r.reason) for r in quality_filter(docs).collect()}
    assert got[1] == (True, "keep")
    assert got[2] == (False, "too_short")
    assert got[3][0] is False and got[3][1] in ("low_alpha", "too_numeric")


def test_zorder_write_tightens_file_envelopes(spark, tmp_path):
    """Z-ordered files must cover a small fraction of BOTH key domains, so
    footer min/max skips most files for a predicate on either column; a plain
    write gives every file near-full coverage on at least one."""
    import pyarrow.parquet as pq

    from lakeflow.catalog import write_zordered

    df = (
        spark.range(20_000)
        .selectExpr(
            "cast(id % 141 as bigint) as x",
            "cast((id * 7919) % 139 as bigint) as y",
        )
    )
    plain, zord = str(tmp_path / "plain"), str(tmp_path / "zord")
    df.repartition(16).write.parquet(plain)
    write_zordered(df, zord, ["x", "y"], n_files=16)

    def avg_coverage(path: str) -> float:
        import glob

        spans = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.read_metadata(f)
            mins = {"x": None, "y": None}
            maxs = {"x": None, "y": None}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col = md.row_group(rg).column(ci)
                    nm = col.path_in_schema
                    if nm in mins and col.statistics is not None:
                        lo, hi = col.statistics.min, col.statistics.max
                        mins[nm] = lo if mins[nm] is None else min(mins[nm], lo)
                        maxs[nm] = hi if maxs[nm] is None else max(maxs[nm], hi)
            if mins["x"] is None or mins["y"] is None:
                continue
            spans.append(
                ((maxs["x"] - mins["x"]) / 140.0 + (maxs["y"] - mins["y"]) / 138.0)
                / 2.0
            )
        assert spans
        return sum(spans) / len(spans)

    cov_plain, cov_z = avg_coverage(plain), avg_coverage(zord)
    assert cov_plain > 0.9  # round-robin: every file spans both full domains
    assert cov_z < 0.6  # z-clustered: each file covers a window of each dim


@slow_lane
def test_pysource_stream_replays_exactly(spark, tmp_path):
    """The custom Python stream source must drain deterministically across
    successive runs sharing a checkpoint, and its union of micro-batches must
    equal the batch scan of the same range."""
    from lakeflow.sources.pysource import register_tick_source

    register_tick_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    for _ in range(4):  # each availableNow run consumes ≥1 micro-batch
        q = (
            spark.readStream.format("lakeflow_ticks")
            .option("n", "300")
            .option("batch", "100")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    streamed = spark.read.parquet(out).select("symbol", "seq", "price")
    batch = (
        spark.read.format("lakeflow_ticks")
        .option("n", "300")
        .load()
        .select("symbol", "seq", "price")
    )
    assert streamed.count() == 300
    assert streamed.exceptAll(batch).isEmpty()
    assert batch.exceptAll(streamed).isEmpty()


def test_observed_metrics_ride_the_action(spark):
    """observe() must report rows/null-keys/non-positives from the SAME job
    that materializes the frame — no second pass."""
    from lakeflow.operators.transforms import observed_quality_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (None, 5.0), (3, -2.0), (4, 0.0)],
        "k int, v double",
    )
    observed, obs = observed_quality_metrics(df, "k", "v")
    assert observed.count() == 4
    got = obs.get
    assert (got["rows"], got["null_keys"], got["nonpositive"]) == (4, 1, 2)


def test_format_detection_and_merge_sql(spark):
    """No lakehouse jars in this env → detection must return None (DataFrame
    fallback); the generated MERGE statements must carry the reference's
    exact clause structure for when a format IS present."""
    from lakeflow.formats import (
        detect_lakehouse_format,
        scd1_merge_sql,
        scd2_expire_sql,
        scd2_insert_sql,
    )

    assert detect_lakehouse_format(spark) is None

    # SET columns unqualified (Delta rejects t.-prefixed), ON null-safe.
    m1 = scd1_merge_sql("silver.dim", "src", ["k"], ["k", "v"])
    assert "ON t.k <=> s.k" in m1
    assert "WHEN MATCHED THEN UPDATE SET v = s.v" in m1
    assert "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)" in m1

    e = scd2_expire_sql("silver.dim", "src", ["k"], ["v"], "2024-01-01 00:00:00")
    assert "t.is_current = 1" in e and "NOT (t.v <=> s.v)" in e
    assert "is_current = 0" in e

    i = scd2_insert_sql("silver.dim", "src", ["k"], ["k", "v"], "2024-01-01 00:00:00")
    assert "WHEN NOT MATCHED THEN INSERT" in i and "is_current" in i


def test_multimodal_feature_extraction(spark):
    """Encoder plumbing: one unit-norm dim-16 vector per payload,
    deterministic across runs, composable with the ANN operators."""
    from lakeflow.operators.multimodal import attach_binary_payload, extract_features
    from lakeflow.operators.similarity import brute_force_topk

    docs = spark.createDataFrame(
        [(i, f"doc number {i} body text") for i in range(8)],
        "doc_id long, text string",
    )
    media = attach_binary_payload(docs)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 8 and all(len(r.embedding) == 16 for r in rows)
    import math

    for r in rows:
        assert abs(math.sqrt(sum(x * x for x in r.embedding)) - 1.0) < 1e-5
    again = {r.media_id: r.embedding for r in extract_features(media, dim=16).collect()}
    assert all(again[r.media_id] == r.embedding for r in rows)

    topk = brute_force_topk(
        feats, feats.limit(2), k=3, id_col="media_id", vec_col="embedding"
    )
    assert topk.count() == 6


def test_bucketed_near_dups_match_exact_at_high_threshold(spark):
    """The multi-probe bucketed near-dup join must find exactly the pairs the
    O(n²) exact form finds in the near-dup regime (cos >= 0.95): vectors that
    close virtually never straddle >2 sign projections, and the parity here
    pins it for the fixture corpus + planted perturbed duplicates."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_exact,
    )

    from .conftest import SF_DIR

    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # Plant near-identical copies: +1e-3 on the first component, new ids.
    dups = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding")[0] + F.lit(1e-3)),
            F.slice("embedding", 2, 63),
        ).alias("embedding"),
    )
    corpus = base.unionByName(dups)
    got = sorted(
        tuple(r) for r in embedding_near_dups(corpus, threshold=0.95).collect()
    )
    want = sorted(
        tuple(r)
        for r in embedding_near_dups_exact(corpus, threshold=0.95).collect()
    )
    assert len(want) >= dups.count()  # every planted pair qualifies
    assert got == want


def test_lsh_salt_guard_bounds_degenerate_buckets(spark):
    """A corpus of near-identical boilerplate collapses into one LSH bucket;
    the salt guard must bound per-bucket pair counts instead of emitting
    O(B²) pairs, and must be a no-op when buckets are under the cap."""
    from lakeflow.operators import dedup as dd

    docs = spark.range(200).selectExpr(
        "id AS doc_id",
        "'the same boilerplate license header text repeated' AS text",
    )
    shingles = dd.word_shingles(docs, n=3)
    sigs = dd.minhash_signatures(shingles, num_hashes=16)

    unsalted = dd.lsh_candidate_pairs(sigs).count()
    assert unsalted == 200 * 199 // 2  # degenerate: all pairs collide

    salted = dd.lsh_candidate_pairs(sigs, max_bucket=50)
    n_salted = salted.count()
    # 4 salt groups of ~50 → ~4·C(50,2); allow hash-imbalance headroom but
    # require an order-of-magnitude cut vs the unsalted quadratic blowup.
    assert n_salted < unsalted / 3

    # Under-cap corpora are untouched by the guard.
    small = sigs.limit(20)
    a = sorted(tuple(r) for r in dd.lsh_candidate_pairs(small).collect())
    b = sorted(
        tuple(r) for r in dd.lsh_candidate_pairs(small, max_bucket=50).collect()
    )
    assert a == b


def test_deletion_neighborhood_matches_naive_quadratic(spark):
    """SymSpell candidate generation must have recall 1 for lev <= 2: the
    edit_distance_pairs result equals the naive within-block self-join on a
    corpus with substitutions, insertions, deletions, and char runs."""
    from lakeflow.operators.linkage import edit_distance_pairs

    names = [
        "Customer#000000001", "Customer#000000101",  # 1 substitution
        "Customer#000010001", "Customer#100000001",  # 2-sub combos exist
        "Customer#00000001",                         # deletion (len-1)
        "Customer#0000000011",                       # insertion (len+1)
        "Wide#aaaabbbb", "Wide#aaabbbb",             # run deletion
        "Totally-Different-Name",
    ]
    df = spark.createDataFrame(
        [(i, n, i % 2) for i, n in enumerate(names)], "id long, name string, blk int"
    )
    got = sorted(
        tuple(r)
        for r in edit_distance_pairs(df, "name", "id", ["blk"], 2).collect()
    )
    a = df.selectExpr("id AS id_a", "name AS name_a", "blk")
    b = df.selectExpr("id AS id_b", "name AS name_b", "blk")
    naive = (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b", 2))
        .filter(F.col("dist") >= 0)
        .selectExpr("id_a", "id_b", "CAST(dist AS INT) AS dist")
    )
    want = sorted(tuple(r) for r in naive.collect())
    assert len(want) > 0
    assert got == want


def test_winnow_jvm_matches_udtf(spark):
    """The Catalyst-window winnowing (registered query) must reproduce the
    UDTF form exactly — same fingerprint positions and hashes, including
    rightmost-min tie-breaks and the short-document guard."""
    from lakeflow.catalog import load_table
    from lakeflow.operators.text import winnow_fingerprints, winnow_fingerprints_jvm

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    jvm = sorted(tuple(r) for r in winnow_fingerprints_jvm(docs).collect())
    udtf = sorted(tuple(r) for r in winnow_fingerprints(docs).collect())
    assert len(jvm) > 0
    assert jvm == udtf


def test_kafka_stream_surface(spark):
    """Pin the Kafka source API surface (SURVEY §2.1 S2/T6). Without the
    connector jar the plan must fail at *source resolution* — proving the
    option/schema wiring executed — and the test skips with that reason;
    with a jar present it must build an unresolved streaming plan."""
    from lakeflow.sources.streams import kafka_json_stream

    try:
        df = kafka_json_stream(
            spark,
            bootstrap_servers="broker:9092",
            topic="ohlcv_1m",
            schema="symbol string, time timestamp, close double",
        )
    except Exception as ex:  # jar absent → DATA_SOURCE_NOT_FOUND
        msg = str(ex)
        assert "kafka" in msg.lower() and (
            "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg
        ), f"unexpected failure mode: {msg[:200]}"
        pytest.skip("kafka connector jar not on classpath; wiring verified")
    assert df.isStreaming
    assert set(df.columns) == {"symbol", "time", "close"}


def test_multitable_lsh_recall_monotone_vs_brute_force(spark):
    """The num_tables knob must buy recall: candidates are unioned across
    independent hash tables, so recall@5 against the exact brute-force top-5
    is non-decreasing in num_tables, and multi-table strictly improves on
    single-table for the fixture corpus (which has known misses at 1 table).
    num_tables=1 must reproduce the original single-table results exactly."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import brute_force_topk, lsh_bucketed_topk

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.qid, r.vid) for r in brute_force_topk(emb, queries, k=5).collect()
    }
    assert exact

    recalls = {}
    results = {}
    # 4 planes (16 buckets): collision probability per table is high enough
    # at fixture scale that extra tables measurably move recall; 8 planes
    # leaves non-near-dup neighbors in distinct buckets at any table count.
    for t in (1, 2, 4):
        got = {
            (r.qid, r.vid)
            for r in lsh_bucketed_topk(
                emb, queries, k=5, dim=64, planes=4, num_tables=t
            ).collect()
        }
        results[t] = got
        recalls[t] = len(got & exact) / len(exact)
    assert recalls[1] <= recalls[2] <= recalls[4], recalls
    assert recalls[4] > recalls[1], recalls
    # Each extra table only ever adds candidates for the same (planes, dim):
    # a pair found at t tables is still bucket-matched at t+1 tables, and the
    # exact-cosine ranking is identical — so hits only grow.
    assert results[1] & exact <= results[2] & exact <= results[4] & exact


def test_stateful_stream_executes_on_rocksdb_state_store(spark, tmp_path):
    """SURVEY §7.2 M6: the streaming profile's RocksDB state store must
    actually run a stateful query, not just appear in conf. Executes a
    watermarked windowed count through the micro-batch engine with the
    RocksDB provider bound; skips (with reason) only when the native RocksDB
    library cannot load in this environment."""
    import pytest
    from pyspark.sql import functions as F

    from lakeflow.profiles import cluster_profile
    from lakeflow.streaming.sinks import run_to_memory

    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = cluster_profile(executors=1, streaming=True)[key]
    prev = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        src = tmp_path / "src"
        spark.createDataFrame(
            [
                ("2026-01-01 00:00:10", "a"),
                ("2026-01-01 00:00:20", "a"),
                ("2026-01-01 00:01:10", "b"),
            ],
            "ts string, k string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(str(src))
        stream = (
            spark.readStream.schema("ts timestamp, k string").parquet(str(src))
            .withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "1 minute"), "k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        try:
            name, q = run_to_memory(stream, state_partitions=4)
        except Exception as exc:  # noqa: BLE001 — env gate, see docstring
            msg = str(exc)
            if "RocksDB" in msg or "UnsatisfiedLink" in msg:
                pytest.skip(f"RocksDB state store unavailable here: {msg[:200]}")
            raise
        # availableNow + append emits only watermark-closed windows; the
        # 00:00 window closes once the 00:01 row advances the watermark.
        got = {
            (r.k, r.n)
            for r in spark.table(name).select("k", "n").collect()
        }
        assert got == {("a", 2)}
        # The run's state provider really was RocksDB: the provider surfaces
        # its rocksdb* custom metrics on every stateful operator (an HDFS-
        # backed run reports loadedMapCacheHitCount instead).
        ops = q.lastProgress["stateOperators"]
        assert ops and all(
            any(k.startswith("rocksdb") for k in op["customMetrics"])
            for op in ops
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@pytest.mark.parametrize("ts_layout", ["int64_nanos", "timestamp_us", "timestamp_ns"])
def test_events_fixture_dtype_robustness(spark, tmp_path, ts_layout):
    """Every events entry point (batch + streaming) must analyze cleanly on
    every ts layout a fixture has ever shipped: raw int64 epoch-nanos,
    timestamp[us], and pandas-default timestamp[ns] (parquet TIMESTAMP(NANOS),
    which Spark surfaces as bigint under nanosAsLong). The round-3 fixture
    regeneration flipped nanos→micros and broke all six stream_* queries
    (VERDICT r3 #1); this pins the whole class of bug as a unit failure."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakeflow.catalog import load_table
    from lakeflow.sources.streams import events_stream

    base = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:10:00", "2024-01-01 01:00:00"]
            ),
            "user_id": [10, 11, 10],
            "event_type": ["view", "purchase", "view"],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}", "{}", "{}"],
        }
    )
    tbl = pa.Table.from_pandas(base, preserve_index=False)
    if ts_layout == "int64_nanos":
        idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            idx, "ts", pa.array(base["ts"].astype("int64"), pa.int64())
        )
    elif ts_layout == "timestamp_us":
        tbl = tbl.cast(tbl.schema.set(
            tbl.schema.get_field_index("ts"), pa.field("ts", pa.timestamp("us"))
        ))
    # timestamp_ns: pandas default — parquet TIMESTAMP(NANOS)
    sf_dir = tmp_path / ts_layout
    sf_dir.mkdir()
    pq.write_table(tbl, sf_dir / "events.parquet")

    batch = load_table(spark, str(sf_dir), "events")
    assert dict(batch.dtypes)["ts"].startswith("timestamp")
    assert batch.count() == 3

    stream = events_stream(spark, str(sf_dir))
    # analysis is what broke in r3 — force it (schema access resolves the plan)
    assert dict(stream.dtypes)["ts"].startswith("timestamp")
    agg = stream.withWatermark("ts", "1 minutes").groupBy("event_type").count()
    assert agg.isStreaming


def test_densify_offgrid_policies(spark):
    """densify_interpolate must not silently drop off-grid observations:
    default errors at execution, snap folds them onto the key's grid,
    ignore keeps the documented legacy drop."""
    from pyspark.sql.utils import AnalysisException

    from lakeflow.operators.timeseries import densify_interpolate

    rows = [(1, 0, 1.0), (1, 3600, 2.0), (1, 7200 + 600, 4.0)]  # last is off-grid
    df = spark.createDataFrame(rows, "user_id long, bucket long, v double")

    with pytest.raises(Exception) as ei:
        densify_interpolate(df, offgrid="error").collect()
    assert "off-grid" in str(ei.value)

    snapped = {
        (r.bucket, r.v, r.observed)
        for r in densify_interpolate(df, offgrid="snap").collect()
    }
    assert (7200, 4.0, True) in snapped and len(snapped) == 3

    # legacy drop: the off-grid OBSERVATION vanishes (its bucket still pads
    # the span, ffilled as unobserved) — exactly the silent data loss the
    # default guard exists to catch.
    ignored = {
        (r.bucket, r.v, r.observed)
        for r in densify_interpolate(df, offgrid="ignore").collect()
    }
    assert ignored == {(0, 1.0, True), (3600, 2.0, True), (7200, 2.0, False)}

    # on-grid data passes the default guard untouched
    ok = spark.createDataFrame(
        [(1, 0, 1.0), (1, 7200, 3.0)], "user_id long, bucket long, v double"
    )
    got = {(r.bucket, r.v) for r in densify_interpolate(ok).collect()}
    assert got == {(0, 1.0), (3600, 2.0), (7200, 3.0)}

    with pytest.raises(ValueError):
        densify_interpolate(df, offgrid="nope")


def test_bucketed_near_dups_recall_at_registered_threshold(spark):
    """Pin recall of the bucketed multi-probe near-dup join at the REGISTERED
    operating point (threshold 0.5, the embedding_near_dups query): the DuckDB
    oracle replays the same buckets, so a recall regression is invisible to
    the correctness gate — this exact-twin comparison is the only check that
    fails if the bucket/probe construction loses pairs it used to find.

    The miss-set is accepted explicitly, with a pinned floor: when this test
    was written the construction found 1/1 exact pairs at sf0.01 and 10/14 at
    sf0.1; the floor 2/3 accepts that measured operating point and fails on
    any regression below it. Runs at sf0.01 — the sf0.001 corpus has no
    cos ≥ 0.5 pairs at all, so only the mid fixture exercises the recall.
    """
    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import (
        embedding_near_dups,
        embedding_near_dups_exact,
    )

    from .conftest import SF_DIR_MID

    corpus = load_table(spark, SF_DIR_MID, "embeddings").select(
        "vec_id", "embedding"
    )
    got = {
        (r.id_a, r.id_b) for r in embedding_near_dups(corpus, threshold=0.5).collect()
    }
    want = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups_exact(corpus, threshold=0.5).collect()
    }
    assert got <= want  # no false pairs: rescoring is exact
    assert len(want) > 0
    recall = len(got & want) / len(want)
    assert recall >= 2 / 3, f"recall dropped to {recall:.3f} ({len(got)}/{len(want)})"


def test_embeddings_fixture_dtype_robustness(spark, tmp_path):
    """Similarity ops must analyze and score identically whether the fixture
    ships embedding as array<float> (today) or array<double> (the plausible
    regeneration drift) — all math promotes per-element to double, so scores
    must be bit-identical, not merely close (same r3-class hardening as the
    events ts test). Both layouts run inside ONE test body and compare
    directly (ADVICE r4: the previous parametrized form stashed the
    reference on a function attribute, which silently skipped the
    comparison under xdist or single-case runs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakeflow.operators.similarity import brute_force_topk

    vecs = [[float(i + j) / 10.0 for j in range(8)] for i in range(20)]
    results = {}
    for elem_type, pa_type in (("float", pa.float32()), ("double", pa.float64())):
        tbl = pa.table(
            {
                "vec_id": pa.array(range(20), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa_type)),
                "label": pa.array([i % 3 for i in range(20)], pa.int32()),
            }
        )
        d = tmp_path / elem_type
        d.mkdir()
        pq.write_table(tbl, d / "embeddings.parquet")
        df = spark.read.parquet(str(d / "embeddings.parquet"))
        results[elem_type] = sorted(
            (r.qid, r.vid, r.cos)
            for r in brute_force_topk(df, df.limit(3), k=2).collect()
        )
    assert len(results["double"]) == 6
    assert all(isinstance(c, float) for _, _, c in results["double"])
    # float32 STORAGE with double accumulation must reproduce the
    # double-typed ground truth exactly for these representable inputs
    assert results["float"] == results["double"]


def test_apply_changes_semantics(spark):
    """CDC apply: latest change per key wins, a key whose latest change is a
    delete vanishes, untouched target keys survive, and reordering the feed
    never changes the result."""
    from lakeflow.operators.merge import apply_changes

    target = spark.createDataFrame(
        [(1, "old"), (2, "keep"), (3, "stale")], "k long, v string"
    )
    feed = spark.createDataFrame(
        [
            (1, 10, "U", "v1"),
            (1, 20, "U", "v2"),   # latest for k=1 → wins
            (3, 5, "D", None),    # latest for k=3 is delete → k=3 gone
            (4, 1, "U", "new"),
            (4, 2, "D", None),    # inserted then deleted → absent
            (5, 7, "D", None),
            (5, 9, "U", "back"),  # deleted then re-upserted → present
        ],
        "k long, seq long, op string, v string",
    )
    want = {(1, "v2"), (2, "keep"), (5, "back")}
    got = {
        (r.k, r.v)
        for r in apply_changes(target, feed, ["k"], "seq").collect()
    }
    assert got == want
    # reordering invariance: shuffled feed, same result
    import random

    rows = feed.collect()
    random.Random(7).shuffle(rows)
    shuffled = spark.createDataFrame(rows, feed.schema)
    got2 = {
        (r.k, r.v)
        for r in apply_changes(target, shuffled, ["k"], "seq").collect()
    }
    assert got2 == want
    # empty-target hydration
    got3 = {
        (r.k, r.v) for r in apply_changes(None, feed, ["k"], "seq").collect()
    }
    assert got3 == {(1, "v2"), (5, "back")}


def test_sessionize_tws_surface(spark):
    """transformWithStateInPandas twin of the gap sessionizer (Spark 4
    StatefulProcessor API, SURVEY.md §2.8 T7 headroom). The TWS Python
    driver worker needs google.protobuf, which this sandbox does not ship —
    the operator raises a reasoned ImportError and this surface test skips,
    mirroring the Kafka-jar gate (S2/T6). With the dependency present,
    construction proceeds and the stream_gap_sessions oracle applies
    unchanged (same schema, same close rules, same micro-unit sums)."""
    from lakeflow.sources.streams import events_stream
    from lakeflow.streaming.stateful import sessionize_stream_tws

    from .conftest import SF_DIR

    stream = events_stream(spark, SF_DIR).select("ts", "user_id", "value")
    try:
        df = sessionize_stream_tws(stream, gap="30 minutes", watermark="1 minutes")
    except ImportError as exc:
        pytest.skip(f"environment-gated: {exc}")
    assert df.schema.fieldNames() == [
        "user_id", "session_start", "session_end", "n_events", "total_value",
    ]


def test_ngram_novelty_hand_computed(spark):
    """3-gram novelty: doc 1 and doc 2 share one trigram ('a b c'), so each
    loses exactly that gram from its unique set; a doc shorter than n emits
    n_grams=0 with NULL novelty."""
    from lakeflow.operators.text import ngram_novelty

    df = spark.createDataFrame(
        [
            (1, "a b c d"),      # grams: 'a b c' (shared), 'b c d' → novelty 1/2
            (2, "a b c"),        # grams: 'a b c' (shared) → novelty 0
            (3, "x y z w"),      # grams all unique → novelty 1
            (4, "p q"),          # too short → 0 grams, NULL novelty
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.novelty)
        for r in ngram_novelty(df, n=3).collect()
    }
    assert got == {1: (2, 0.5), 2: (1, 0.0), 3: (2, 1.0), 4: (0, None)}


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """MLlib-KMeans-trained IVF: recall against the exact cosine top-k must
    rise monotonically with the probe count and clear a floor at 8/16
    cells (the fixture embeddings are near-uniform — IVF's hardest case —
    so the floor is about cell coverage, not cluster luck). Wherever the
    approximate and exact results agree on a pair, the rescored cosine is
    bit-identical (precision is exact by construction)."""
    from .conftest import SF_DIR

    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import brute_force_topk, ivf_kmeans_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.qid, r.vid): r.cos
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    recalls = []
    for n_probe in (4, 8):
        approx = {
            (r.qid, r.vid): r.cos
            for r in ivf_kmeans_topk(
                emb, queries, k=5, n_probe=n_probe, nlist=16
            ).collect()
        }
        hits = set(exact) & set(approx)
        recalls.append(len(hits) / len(exact))
        assert all(exact[p] == approx[p] for p in hits)
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] >= 0.75, f"trained-IVF recall {recalls[-1]:.2f} at 8/16"


def test_asof_join_forward_tolerance_semantics(spark):
    """Forward as-of with tolerance: each left row attaches the EARLIEST
    right row at-or-after it; a nearest match beyond the tolerance is NULL
    under how='left' and dropped under how='inner'; equal timestamps match."""
    from datetime import datetime

    from lakeflow.operators.joins import asof_join

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def ts(m):
        return t0.replace(minute=m)

    left = spark.createDataFrame(
        [(1, ts(0), "a"), (1, ts(30), "b"), (2, ts(0), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        # k=1: events at :05 and :06 (first wins for 'a'); nothing after :30
        # k=2: only at :20 — beyond the 10-minute tolerance for 'c'
        [(1, ts(5), 100), (1, ts(6), 101), (2, ts(20), 200)],
        "k long, ts timestamp, rv int",
    )
    kw = dict(
        on=["k"], left_ts="ts", right_ts="ts", payload={"rv": "rv"},
        direction="forward", tolerance_seconds=600,
    )
    left_mode = {
        (r.tag, r.rv) for r in asof_join(left, right, how="left", **kw).collect()
    }
    assert left_mode == {("a", 100), ("b", None), ("c", None)}
    inner = {
        (r.tag, r.rv) for r in asof_join(left, right, how="inner", **kw).collect()
    }
    assert inner == {("a", 100)}
    # backward default unchanged: 'b' sees the latest prior (:06 -> 101)
    back = {
        (r.tag, r.rv)
        for r in asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload={"rv": "rv"},
        ).collect()
    }
    assert back == {("a", None), ("b", 101), ("c", None)}


def test_asof_join_tied_right_rows_pick_deterministically(spark):
    """Right rows tied on (key, ts) must resolve to the SAME winner
    whatever the physical layout: without the payload-hash tie-break in
    the window ordering, last() returns whichever tied row sorted last in
    shuffle-arrival order — stable locally, layout-dependent on a
    cluster. Pin: every partitioning and input order yields one answer."""
    from datetime import datetime

    from lakeflow.operators.joins import asof_join

    t = datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t, "x")], "k long, ts timestamp, tag string")
    rows = [(1, t, v) for v in (100, 101, 102)]
    results = set()
    for parts, ordered in ((1, rows), (7, rows[::-1]), (3, rows[1:] + rows[:1])):
        right = spark.createDataFrame(
            ordered, "k long, ts timestamp, rv int"
        ).repartition(parts)
        got = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload={"rv": "rv"},
        ).collect()
        assert len(got) == 1
        results.add(got[0].rv)
    assert len(results) == 1, f"tie winner varied with layout: {results}"


def test_asof_join_total_order_suffix_handles_any_payload_type(spark):
    """VERDICT r11 ask #8: the carried columns' sort proxies follow the
    tie-break hash in the window sort, making the order unconditionally
    total. Pin the two type edges: an ARRAY payload rides the sort suffix
    directly (orderable nested type — must analyze and stay deterministic
    across layouts), and a MAP payload — which Spark can neither sort nor
    xxhash64 raw (joining one was an AnalysisException before r12) — rides
    as entry-sorted map_entries and is ALSO layout-deterministic."""
    from datetime import datetime

    from lakeflow.operators.joins import asof_join

    t = datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t, "x")], "k long, ts timestamp, tag string")
    arr_rows = [(1, t, [i, i + 1]) for i in (100, 200, 300)]
    winners = set()
    for parts, ordered in ((1, arr_rows), (5, arr_rows[::-1])):
        right = spark.createDataFrame(
            ordered, "k long, ts timestamp, rv array<int>"
        ).repartition(parts)
        got = asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            payload={"rv": "rv"},
        ).collect()
        winners.add(tuple(got[0].rv))
    assert len(winners) == 1

    map_rows = [(1, t, {"a": i}) for i in (1, 2, 3)]
    map_winners = set()
    for parts, ordered in ((1, map_rows), (5, map_rows[::-1])):
        right_map = spark.createDataFrame(
            ordered, "k long, ts timestamp, rv map<string,int>"
        ).repartition(parts)
        got = asof_join(
            left, right_map, on=["k"], left_ts="ts", right_ts="ts",
            payload={"rv": "rv"},
        ).collect()
        map_winners.add(got[0].rv["a"])
    assert len(map_winners) == 1

    # CalendarIntervalType payload: a window ORDER BY on the raw column is
    # an AnalysisException, but since ADVICE r12 #1 it gets a canonical
    # cast(string) sort proxy, so it participates in BOTH the hash and the
    # sort suffix and the tie-break stays total. Three tied right rows
    # differing only in the interval must resolve layout-independently.
    iv_rows = [(1, t, m) for m in (3, 7, 11)]
    iv_winners = set()
    for parts, ordered in ((1, iv_rows), (5, iv_rows[::-1])):
        right_iv = spark.createDataFrame(
            ordered, "k long, ts timestamp, months int"
        ).selectExpr("k", "ts", "make_interval(0, months) AS rv")
        joined_iv = asof_join(
            left, right_iv.repartition(parts), on=["k"], left_ts="ts",
            right_ts="ts", payload={"rv": "rv"},
        )
        # CalendarInterval has no Python deserializer, so read JVM-side.
        iv_winners.add(
            joined_iv.selectExpr("cast(rv AS string) AS s").collect()[0].s
        )
    assert len(iv_winners) == 1 and None not in iv_winners

    # Hashable-but-unorderable payload with NO canonical sortable form
    # (struct<interval>): must stay out of the sort suffix (ORDER BY on it
    # fails analysis) but ride RAW in xxhash64, so two tied rows differing
    # only here still get distinct sort keys — hash-strong, not total
    # (ADVICE r12 #1: the pre-fix code dropped it from the hash too,
    # making the winner layout-dependent again).
    si_rows = [(1, t, m) for m in (3, 7, 11)]
    si_winners = set()
    for parts, ordered in ((1, si_rows), (5, si_rows[::-1])):
        right_si = spark.createDataFrame(
            ordered, "k long, ts timestamp, months int"
        ).selectExpr("k", "ts", "named_struct('iv', make_interval(0, months)) AS rv")
        joined_si = asof_join(
            left, right_si.repartition(parts), on=["k"], left_ts="ts",
            right_ts="ts", payload={"rv": "rv"},
        )
        si_winners.add(
            joined_si.selectExpr("cast(rv.iv AS string) AS s").collect()[0].s
        )
    assert len(si_winners) == 1 and None not in si_winners

    # Null-swap across TWO hash-only columns: Spark's hash exprs skip
    # null children, so raw (NULL, s) and (s, NULL) would collide
    # systematically — the per-position inner hash must keep them
    # distinct and the winner layout-independent (r13 review finding).
    ns_rows = [(1, t, 3, None), (1, t, None, 3)]
    ns_winners = set()
    for parts, ordered in ((1, ns_rows), (5, ns_rows[::-1])):
        right_ns = spark.createDataFrame(
            ordered, "k long, ts timestamp, ma int, mb int"
        ).selectExpr(
            "k", "ts",
            "CASE WHEN ma IS NULL THEN NULL"
            " ELSE named_struct('iv', make_interval(0, ma)) END AS rva",
            "CASE WHEN mb IS NULL THEN NULL"
            " ELSE named_struct('iv', make_interval(0, mb)) END AS rvb",
        )
        joined_ns = asof_join(
            left, right_ns.repartition(parts), on=["k"], left_ts="ts",
            right_ts="ts", payload={"rva": "rva", "rvb": "rvb"},
        )
        ns_winners.add(
            tuple(
                joined_ns.selectExpr(
                    "cast(rva.iv AS string) AS a", "cast(rvb.iv AS string) AS b"
                ).collect()[0]
            )
        )
    assert len(ns_winners) == 1

    # VARIANT payload: Spark can neither sort nor xxhash64 it raw
    # (HASH_VARIANT_TYPE), but the key-sorted to_json canonical string
    # makes it both — total tie-break, layout-independent winner.
    v_rows = [(1, t, f'{{"a":{i}}}') for i in (1, 2, 3)]
    v_winners = set()
    for parts, ordered in ((1, v_rows), (5, v_rows[::-1])):
        right_v = spark.createDataFrame(
            ordered, "k long, ts timestamp, j string"
        ).selectExpr("k", "ts", "parse_json(j) AS rv")
        joined_v = asof_join(
            left, right_v.repartition(parts), on=["k"], left_ts="ts",
            right_ts="ts", payload={"rv": "rv"},
        )
        v_winners.add(
            joined_v.selectExpr("to_json(rv) AS s").collect()[0].s
        )
    assert len(v_winners) == 1 and None not in v_winners


def test_asof_join_empty_payload_is_valid(spark):
    """Degenerate-but-legal call: payload={} with neither tolerance nor
    how='inner' leaves the carried-column dict empty, and the tie-break
    hash must not become a zero-argument xxhash64 (analysis error —
    ADVICE r10). The result is just the left rows."""
    from datetime import datetime

    from lakeflow.operators.joins import asof_join

    t = datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t, "x")], "k long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, t, 9)], "k long, ts timestamp, rv int")
    got = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", payload={}
    ).collect()
    assert [(r.k, r.tag) for r in got] == [(1, "x")]


def test_asof_join_time_bucket_salt_parity(spark):
    """The hot-key time-bucket salt (VERDICT r10 ask #3) must be output-
    equal to the unsalted form on a skewed fixture — one key holds >=60%
    of all rows — across directions, tolerance, and how, including null
    payload values (per-column carry) and right rows tied on (key, ts)
    (boundary-tie winner must match). Bucket chosen small enough that
    histories span many buckets AND some buckets are right-row-free, so
    the cross-bucket seed carry is actually exercised."""
    import random
    from datetime import datetime, timedelta

    from lakeflow.operators.joins import asof_join

    rng = random.Random(11)
    t0 = datetime(2024, 1, 1)
    # hot key 0: 120 left + 90 right rows over ~6 h; cold keys 1-4: sparse
    lrows, rrows = [], []
    for k, nl, nr in [(0, 120, 90), (1, 12, 9), (2, 8, 0), (3, 0, 7), (4, 5, 5)]:
        for i in range(nl):
            lrows.append((k, t0 + timedelta(seconds=rng.randrange(0, 21600)), i))
        for i in range(nr):
            ts = t0 + timedelta(seconds=rng.randrange(0, 21600))
            rrows.append((k, ts, None if i % 7 == 0 else i * 10, f"v{i}"))
    rrows += [rrows[3], rrows[3][:2] + (999, "dup")]  # ties on (k, ts)
    left = spark.createDataFrame(lrows, "k long, ts timestamp, seq int")
    right = spark.createDataFrame(rrows, "k long, ts timestamp, a int, b string")
    for direction, tol, how in [
        ("backward", None, "left"),
        ("backward", 900, "inner"),
        ("forward", 600, "left"),
    ]:
        kw = dict(
            on=["k"], left_ts="ts", right_ts="ts",
            payload={"a": "ra", "b": "rb"},
            direction=direction, tolerance_seconds=tol, how=how,
        )
        plain = asof_join(left, right, **kw)
        salted = asof_join(left, right, time_bucket_seconds=600, **kw)
        assert plain.columns == salted.columns
        key = lambda r: (r.k, r.ts, r.seq, r.ra, r.rb)
        assert sorted(map(key, salted.collect())) == sorted(
            map(key, plain.collect())
        ), f"salt diverged for {direction}/{tol}/{how}"


def test_pq_adc_recall_at_operating_point_and_exact_at_full_shortlist(spark):
    """PQ/ADC invariants: (a) recall@5 against exact brute force at the
    registered operating point (shortlist 64 of 500) holds at the measured
    0.7 floor; (b) with shortlist >= |corpus| the exact re-rank sees every
    candidate, so the result IS the brute-force top-k — the approximation
    lives entirely in the shortlist cut, never in the scoring."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators import similarity as sim

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cb = emb.filter(F.col("vec_id") < 16)
    exact = {
        (r["qid"], r["vid"])
        for r in sim.brute_force_topk(emb, q, k=5).collect()
    }

    got = {
        (r["qid"], r["vid"])
        for r in sim.pq_adc_topk(emb, q, cb, k=5, shortlist=64).collect()
    }
    assert len(got & exact) / len(exact) >= 0.7

    full = sim.pq_adc_topk(emb, q, cb, k=5, shortlist=500)
    assert {(r["qid"], r["vid"], r["cos"]) for r in full.collect()} == {
        (r["qid"], r["vid"], r["cos"])
        for r in sim.brute_force_topk(emb, q, k=5).collect()
    }


def test_leakage_safe_split_keeps_duplicates_together(spark):
    """Every doc sharing a content fingerprint must share a split — the
    invariant that makes the split leakage-safe under duplication."""
    from lakeflow.operators.text import leakage_safe_split

    df = spark.createDataFrame(
        [(i, f"doc {i % 10} body text") for i in range(100)],
        "doc_id long, text string",
    )
    out = leakage_safe_split(df).collect()
    by_fp = {}
    for r in out:
        by_fp.setdefault(r["fp"], set()).add(r["split"])
    assert len(by_fp) == 10
    assert all(len(s) == 1 for s in by_fp.values())
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_boilerplate_strip_drops_repeated_segments_keeps_unique(spark):
    """Planted boilerplate: an 8-token header shared by 5 docs is stripped
    everywhere, unique bodies survive in order, and an all-boilerplate doc
    collapses to empty instead of disappearing."""
    from lakeflow.operators.text import boilerplate_strip

    header = "common header tokens appear in every page x"  # 8 tokens
    rows = [
        (i, f"{header} unique body {i} words for doc {i}") for i in range(5)
    ] + [(99, header)]  # pure boilerplate
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in boilerplate_strip(df, max_df=3).collect()}
    assert len(out) == 6
    for i in range(5):
        assert out[i]["clean_text"] == f"unique body {i} words for doc {i}"
        assert out[i]["n_dropped"] == 1
    assert out[99]["clean_text"] == ""
    assert out[99]["n_dropped"] == out[99]["n_segs"] == 1


def test_simhash64_blocking_cuts_candidates_vs_16bit(spark):
    """The production 64-bit signature must (a) lose no pair vs the naive
    O(n^2) join at max_hamming<=3 — pinned by the registered oracle, spot
    re-checked here via the exact join on a sample — and (b) generate far
    fewer blocking candidates than the saturated 16-bit nibble scheme."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators import dedup as dd

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")

    def candidates(keyed_pairs_df):
        return keyed_pairs_df.count()

    sigs64 = dd.simhash64_blocks(docs).persist()
    blocks64 = sigs64.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(k).alias("blk"), F.col(f"b{k}").alias("val"))
                for k in range(4)
            ])
        ).alias("k"),
    ).select("id", "k.blk", "k.val")
    cand64 = blocks64.alias("a").join(
        blocks64.alias("b"),
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.id") < F.col("b.id")),
    ).count()

    sigs16 = dd.simhash16(docs)
    nib = sigs16.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.shiftright(F.col("simhash"), 4 * i)
                    .bitwiseAND(F.lit(0xF))
                    .alias("val"),
                )
                for i in range(4)
            ])
        ).alias("k"),
    ).select("id", "k.blk", "k.val")
    cand16 = nib.alias("a").join(
        nib.alias("b"),
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.id") < F.col("b.id")),
    ).count()
    assert cand64 < cand16 / 3, (cand64, cand16)

    # Exactness spot-check: blocked pairs == naive pairs on a 100-doc sample.
    sample = docs.filter(F.col("doc_id") < 100)
    s = dd.simhash64_blocks(sample)
    blocked = {
        (r["id_a"], r["id_b"])
        for r in dd.simhash64_near_pairs(s).collect()
    }
    ham = sum(
        F.bit_count(
            F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}")).cast("int")
        )
        for k in range(4)
    )
    naive = {
        (r["id_a"], r["id_b"])
        for r in s.alias("a")
        .join(s.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert blocked == naive


def test_bigram_backoff_hand_computed(spark):
    """Exact bigram+backoff values on a corpus small enough to hand-check:
    seen transitions use c(w1 w2)/c(w1); an unseen transition of seen words
    backs off to 0.4*c(w2)/N; an unseen word floors at count 1."""
    import math

    from lakeflow.operators.text import bigram_logprob_scores

    lm = spark.createDataFrame([(0, "a b a b c")], "doc_id long, text string")
    # counts: cb: (a,b)=2 (b,a)=1 (b,c)=1 ; cu: a=2 b=2 c=1 ; N=5
    score_df = spark.createDataFrame(
        [(1, "a b"), (2, "c a"), (3, "a z")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in bigram_logprob_scores(score_df, counts_from=lm).collect()
    }

    def micro(x):
        return math.floor(math.log(x) * 1e6 + 0.5) / 1e6

    assert out[1]["avg_logprob"] == round(micro(2 / 2), 6)          # seen: c(ab)/c(a)
    assert out[2]["avg_logprob"] == round(micro(0.4 * 2 / 5), 6)    # backoff to cu[a]
    assert out[3]["avg_logprob"] == round(micro(0.4 * 1 / 5), 6)    # unseen word floor
    assert all(out[i]["n_bigrams"] == 1 for i in (1, 2, 3))


def test_profile_columns_nulls_and_approx_mode(spark):
    """profile_columns counts nulls per column, renders min/max by kind, and
    its approx mode drops the Expand operator (the exact-distinct price)."""
    from pyspark.sql import functions as F

    from lakeflow.operators.transforms import profile_columns

    df = spark.createDataFrame(
        [(1, 2.5, "a"), (2, None, "b"), (None, 1.25, "b"), (4, 7.0, None)],
        "k long, v double, s string",
    )
    specs = [("k", "int"), ("v", "num"), ("s", "str")]
    out = {r["col_name"]: r for r in profile_columns(df, specs).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_null"] == 1
    assert out["k"]["n_distinct"] == 3
    assert (out["k"]["min_val"], out["k"]["max_val"]) == ("1", "4")
    assert (out["v"]["min_val"], out["v"]["max_val"]) == ("125", "700")  # cents
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2

    exact_plan = (
        profile_columns(df, specs)._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        profile_columns(df, specs, exact_distinct=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # exact multi-distinct pays row replication
    assert "Expand" not in approx_plan  # HLL mode keeps the single clean pass
    approx = {
        r["col_name"]: r
        for r in profile_columns(df, specs, exact_distinct=False).collect()
    }
    # HLL is exact at this cardinality; schema identical either way.
    assert approx["k"]["n_distinct"] == 3


def test_dsir_weights_hand_computed(spark):
    """DSIR log-ratio on a 3-doc corpus: target = doc 1 ('a a'), raw docs
    probe the smoothed target/raw unigram ratio; a token common in the
    target scores positive, an off-target token negative."""
    import math

    from pyspark.sql import functions as F

    from lakeflow.operators.text import dsir_importance_weights

    df = spark.createDataFrame(
        [(1, "a a"), (2, "a b"), (3, "b b")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in dsir_importance_weights(df, F.col("doc_id") == 1).collect()
    }
    assert set(out) == {2, 3}  # target doc itself is not scored

    # vocab: a (tc_t=2, tc_r=1), b (tc_t=0, tc_r=3); nt=2, nr=4, V=2
    def m(tc, n):
        return math.floor(math.log((tc + 1.0) / (n + 2.0)) * 1e6 + 0.5)

    lr_a = m(2, 2) - m(1, 4)  # positive: 'a' is target-like
    lr_b = m(0, 2) - m(3, 4)  # negative: 'b' is off-target
    assert lr_a > 0 > lr_b
    assert out[2]["avg_logratio"] == round((lr_a + lr_b) / 2 / 1e6, 6)
    assert out[3]["avg_logratio"] == round((lr_b + lr_b) / 2 / 1e6, 6)
    assert out[2]["n_tokens"] == 2 and out[3]["n_tokens"] == 2


def test_bpe_learn_merges_hand_computed(spark):
    """BPE trainer vs the classic hand-worked example: on
    'low low low lower lowest / new newer newest low' the learned merges
    must be l+o, lo+w, low+</w>, e+w, n+ew, e+r (count-desc, lexicographic
    ties), and a fully-merged single-symbol word must not break pair
    extraction (sequence(1,0) descends in Spark)."""
    from lakeflow.operators.text import bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(df, n_merges=6)
    assert merges == [
        ("l", "o", 6),
        ("lo", "w", 6),
        ("low", "</w>", 4),
        ("e", "w", 3),
        ("n", "ew", 3),
        ("e", "r", 2),
    ]


def test_bpe_merge_fold_left_to_right_nonoverlapping(spark):
    """The Catalyst merge fold must consume greedily left-to-right without
    overlap: 'aaa' under merge (a,a) becomes [aa, a], never [a, aa] or
    [aa, aa]."""
    from pyspark.sql import functions as F

    from lakeflow.operators.text import _merge_pair_expr

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "a", "a", "a"],), (["b", "a"],)],
        "syms array<string>",
    )
    out = [r[0] for r in df.select(F.expr(_merge_pair_expr("a", "a"))).collect()]
    assert out == [["aa", "a"], ["aa", "aa"], ["b", "a"]]


def test_pysink_jsonl_two_phase_commit(spark, tmp_path):
    """The custom Python DataSource writer must publish shards only at
    commit: after save() the directory holds part-*.jsonl shards named by a
    _MANIFEST and no .tmp leftovers, and the shard union equals the input."""
    import json as _json

    from lakeflow.sources.pysink import register_jsonl_sink

    register_jsonl_sink(spark)
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    ).repartition(2)
    out = str(tmp_path / "sink")
    df.write.format("lakeflow_jsonl_sink").option("path", out).mode(
        "append"
    ).save()

    files = sorted(p.name for p in (tmp_path / "sink").iterdir())
    shards = [f for f in files if f.endswith(".jsonl")]
    assert "_MANIFEST" in files
    assert not [f for f in files if f.endswith(".tmp")]
    assert sorted(_json.load(open(tmp_path / "sink" / "_MANIFEST"))) == shards

    rows = []
    for sh in shards:
        with open(tmp_path / "sink" / sh) as f:
            rows += [_json.loads(line) for line in f]
    assert sorted((r["k"], r["s"], r["v"]) for r in rows) == [
        (1, "a", 10), (2, "b", 20), (3, "c", 30),
    ]


def test_bpe_encode_reproduces_trainer_segmentation(spark):
    """Encoding the training corpus with the learned merge table must
    reproduce the trainer's final symbol state: 'low' collapses to the
    merged low</w> unit, 'newest' segments through the learned n+ew merge,
    and per-doc subword counts are consistent."""
    from pyspark.sql import functions as F

    from lakeflow.operators.text import bpe_encode, bpe_learn_merges

    df = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest low")],
        "doc_id long, text string",
    )
    merges = bpe_learn_merges(df, n_merges=6)
    enc = {r.doc_id: r for r in bpe_encode(df, merges).collect()}
    toks1 = list(enc[1].tokens)
    # three 'low' occurrences fully merged into the low</w> unit
    assert toks1.count("low</w>") == 3
    # 'lower' = low + e + r + </w> after (l,o),(lo,w),(e,r)
    assert toks1.count("er") == 1
    toks2 = list(enc[2].tokens)
    # 'new' = n+ew merged then evolves with the (n, ew) merge
    assert "new" in toks2 or "new</w>" in "".join(toks2)
    assert enc[1].n_tokens == len(toks1) and enc[2].n_tokens == len(toks2)


def test_bitext_ann_recall_vs_exact(spark):
    """VERDICT r5 #2: the multi-probe shortlist's agreement with the exact
    all-pairs bitext baseline, measured and pinned. Both plans are fully
    deterministic (md5-derived hyperplanes, integer micro-unit margins), so
    the recall on the fixture is an exact constant, not a flaky bound. The
    fixture embeddings are near-isotropic — no planted translation pairs —
    which is the WORST case for best-match agreement; the pinned floor is
    therefore conservative for real bitext, where true pairs sit far above
    the noise floor. Candidate mass must also stay strictly below the
    cross product (the point of the shortlist)."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import (
        margin_knn_pairs,
        margin_knn_pairs_ann,
    )

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    left = emb.filter(F.col("label") == 0)
    right = emb.filter(F.col("label") == 1)
    exact = {
        (r.src_id, r.tgt_id)
        for r in margin_knn_pairs(left, right, k=4, min_margin=1.0).collect()
    }
    ann = {
        (r.src_id, r.tgt_id)
        for r in margin_knn_pairs_ann(
            left, right, k=4, min_margin=1.0, planes=5, probe_bits=2
        ).collect()
    }
    assert exact, "fixture produced no exact margin pairs"
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.55, f"shortlist recall degraded: {recall:.2f}"

    # Shortlist cost: candidate pairs < the full cross product.
    n_left, n_right = left.count(), right.count()
    from lakeflow.operators.similarity import _probe_masks, sign_bucket

    a = left.select(
        sign_bucket(F.col("embedding"), 64, 5).alias("bkt")
    ).select(
        F.explode(
            F.array(*[F.lit(m) for m in _probe_masks(5, 2)])
        ).alias("mask"),
        "bkt",
    ).select(F.col("bkt").bitwiseXOR(F.col("mask")).alias("probe"))
    b = right.select(sign_bucket(F.col("embedding"), 64, 5).alias("probe"))
    n_candidates = a.join(b, on="probe").count()
    assert n_candidates < n_left * n_right


def test_span_corruption_hand_computed(spark):
    """Fixed-grid span corruption: masked windows are the md5 draw, span k
    renders as <extra_id_k> in the input and heads the target; tail windows
    mask only what exists; empty docs pass through untouched."""
    import hashlib

    from lakeflow.operators.text import span_corruption

    text = " ".join(f"w{i}" for i in range(20))  # 20 tokens, 3 windows of 8
    df = spark.createDataFrame(
        [(7, text), (8, "")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in span_corruption(df, window=8, span_len=2, window_pct=60)
        .collect()
    }

    def draw(doc_id, w):
        h = hashlib.md5(f"{doc_id}:{w}".encode()).hexdigest()
        return int(h[:8], 16) % 100 < 60

    corrupted = [w for w in range(3) if draw(7, w)]
    toks = text.split(" ")
    expected_target = " ".join(
        f"<extra_id_{k}> " + " ".join(toks[w * 8 : w * 8 + 2])
        for k, w in enumerate(corrupted)
    )
    got = rows[7]
    assert got.n_tokens == 20 and got.n_spans == len(corrupted)
    assert got.n_masked == sum(min(2, 20 - w * 8) for w in corrupted)
    assert got.target_text == expected_target
    inp = got.input_text.split(" ")
    for k, w in enumerate(corrupted):
        assert f"<extra_id_{k}>" in inp
    # Unmasked tokens survive in order; masked ones are gone.
    surviving = [
        t for i, t in enumerate(toks)
        if not (i // 8 in corrupted and i % 8 < 2)
    ]
    assert [t for t in inp if not t.startswith("<extra_id_")] == surviving

    empty = rows[8]
    assert (empty.n_spans, empty.n_masked) in {(0, 0), (1, 1)}  # draw-dependent
    if empty.n_spans == 0:
        assert empty.target_text == ""


def test_exact_substring_dedup_keep_first_semantics(spark):
    """Lee et al. exact-substring dedup: a window repeated across docs is
    removed from every occurrence except the globally-first (lowest
    (doc_id, pos)); full duplicates empty out entirely; docs shorter than
    k pass through whole; within-doc repeats also collapse to one copy."""
    from lakeflow.operators.dedup import exact_substring_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x y a b c d e z"),       # shares "a b c d e" with doc 1
            (3, "p q"),                    # shorter than k
            (4, "a b c d e f g h"),        # full duplicate of doc 1
            (5, "m n o p q m n o p q"),    # within-doc repeat
        ],
        "doc_id long, text string",
    )
    rows = {r.id: r for r in exact_substring_dedup(df, k=5).collect()}
    assert rows[1].deduped_text == "a b c d e f g h"  # first occurrence kept
    assert rows[2].deduped_text == "x y z" and rows[2].n_removed == 5
    assert rows[3].deduped_text == "p q" and rows[3].n_removed == 0
    assert rows[4].deduped_text == "" and rows[4].n_removed == 8
    # within-doc: second "m n o p q" removed, first kept
    assert rows[5].deduped_text == "m n o p q" and rows[5].n_removed == 5


def test_pagerank_hand_computed_and_isolated_nodes(spark):
    """3-node chain + isolated node, 1 iteration by hand: contributions are
    floor(rank/outdeg), damping and base are floor divisions, isolated
    nodes keep the base rank, multi-edges contribute once per edge."""
    from lakeflow.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (2, 3)],  # (2,3) is a double edge
        "src long, dst long",
    )
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    r1 = {
        r.id: r.rank_micro
        for r in pagerank(edges, nodes, iters=1).collect()
    }
    # N=4: r0 = 250000 each; base = (1e6*15)//(100*4) = 37500.
    # node1: no in-edges -> base only
    # node2: from 1 (outdeg 2 -> 125000): base + (85*125000)//100
    # node3: from 1 (125000) + from 2 twice (outdeg 2 -> 125000 per edge)
    assert r1[1] == 37500
    assert r1[2] == 37500 + (85 * 125000) // 100
    assert r1[3] == 37500 + (85 * (125000 + 2 * 125000)) // 100
    assert r1[4] == 37500  # isolated: base only


def test_gopher_rules_fire_on_crafted_docs(spark):
    """The line/symbol Gopher rules the flat fixture can't exercise: a
    bullet-list doc, an ellipsis-heavy doc, a hash-spam doc, and a long
    clean doc that passes everything at published thresholds."""
    from lakeflow.operators.text import gopher_quality_flags

    clean = ("the quick brown fox jumps over the lazy dog and that have "
             "with be to of " * 8).strip()
    bullets = "\n".join(f"• item {i} in the list" for i in range(10))
    dots = "\n".join(f"line {i} trails off..." for i in range(10))
    hashes = "the " + "# " * 40 + "word"
    df = spark.createDataFrame(
        [(1, clean), (2, bullets), (3, dots), (4, hashes)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_flags(df, min_words=10).collect()
    }
    assert out[1]["passes_gopher"] is True
    assert out[2]["passes_bullet_lines"] is False  # 10/10 bullet lines
    assert out[3]["passes_ellipsis_lines"] is False  # 10/10 '...' lines
    assert out[4]["passes_symbol_ratio"] is False  # 40 '#' / 42 words
    assert out[4]["passes_stopwords"] is False  # only 'the' present
    # feature values, not just flags
    assert out[2]["n_words"] == 60  # 10 lines x 6 ws-tokens (incl. bullet)
    assert out[3]["symbol_word_ratio"] > 0.1  # '...' counted as symbols


def test_mmr_rerank_diversifies_and_respects_lambda(spark):
    """MMR semantics: rank 1 is always the plain cosine argmax; with λ=1
    the whole ranking degenerates to plain cosine top-k; with a diversity
    penalty the tail picks must deviate from plain top-k somewhere (the
    fixture's near-dup-rich shortlists make that certain)."""
    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import brute_force_topk, mmr_rerank

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter("vec_id < 5")
    plain = brute_force_topk(emb, queries, k=5)
    plain_sets = {}
    plain_first = {}
    for i, r in enumerate(plain.collect()):
        plain_sets.setdefault(r.qid, []).append(r.vid)
    for q, vids in plain_sets.items():
        plain_first[q] = vids[0]  # brute_force_topk emits rank order

    mmr = mmr_rerank(emb, queries, k=5, shortlist=20).collect()
    by_q = {}
    for r in mmr:
        by_q.setdefault(r.qid, {})[r.rank] = r.vid
    deviated = False
    for q, picks in by_q.items():
        assert len(picks) == 5
        assert picks[1] == plain_first[q], "rank 1 must be the cosine argmax"
        if [picks[i] for i in range(1, 6)] != plain_sets[q]:
            deviated = True
    assert deviated, "diversity penalty never changed a pick"

    # λ = 1 (no penalty): identical ranking to plain cosine top-k
    lam1 = mmr_rerank(emb, queries, k=5, shortlist=20, lam_num=10).collect()
    for r in lam1:
        assert by_ranked(plain_sets, r.qid, r.rank) == r.vid


def by_ranked(plain_sets, qid, rank):
    return plain_sets[qid][rank - 1]


def test_pipeline_retries_and_failure_propagation():
    """Airflow-parity runner semantics: retries re-run a flaky task;
    skip_downstream marks the failed task and its transitive dependents
    while independent branches complete; raise mode surfaces
    TaskFailureError with the attempt count."""
    import pytest as _pt

    from lakeflow.plans.runner import Pipeline, TaskFailureError

    calls = {"flaky": 0}
    p = Pipeline("t")

    @p.task("flaky", retries=2)
    def flaky(results):
        calls["flaky"] += 1
        if calls["flaky"] < 3:
            raise RuntimeError("transient")
        return "ok"

    @p.task("down", deps=("flaky",))
    def down(results):
        return results["flaky"] + "!"

    out = p.run()
    assert out == {"flaky": "ok", "down": "ok!"}
    assert p.report["flaky"] == {"status": "success", "attempts": 3}

    p2 = Pipeline("t2")

    @p2.task("boom")
    def boom(results):
        raise ValueError("dead")

    @p2.task("after_boom", deps=("boom",))
    def after_boom(results):
        return "never"

    @p2.task("independent")
    def independent(results):
        return 42

    out2 = p2.run(on_error="skip_downstream")
    assert out2 == {"independent": 42}
    assert p2.report["boom"]["status"] == "failed"
    assert p2.report["after_boom"]["status"] == "upstream_failed"
    assert p2.report["independent"]["status"] == "success"

    p3 = Pipeline("t3")

    @p3.task("always_fails", retries=1)
    def always_fails(results):
        raise RuntimeError("nope")

    with _pt.raises(TaskFailureError) as ei:
        p3.run()
    assert ei.value.task == "always_fails" and ei.value.attempts == 2


def test_dpo_pairs_ties_and_margin_gate(spark):
    """Tie-breaks and the strict-margin gate of preference-pair extraction:
    equal maxima pick the smallest id, equal minima pick the smallest id,
    a constant-value group emits nothing, a singleton group emits nothing."""
    from lakeflow.operators.timeseries import dpo_pairs

    rows = [
        # g1: max tie at 500 (ids 2,5 -> chosen 2); min tie at 100 (ids 7,9 -> rejected 7)
        (1, 2, 500), (1, 5, 500), (1, 7, 100), (1, 9, 100), (1, 3, 250),
        # g2: constant value -> no pair
        (2, 1, 300), (2, 2, 300),
        # g3: singleton -> chosen == rejected -> gated out
        (3, 4, 42),
        # g4: plain case
        (4, 10, 50), (4, 11, 900),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_id long, c long")
    got = {
        r["user_id"]: r.asDict() for r in dpo_pairs(df).collect()
    }
    assert set(got) == {1, 4}
    assert got[1]["chosen_event_id"] == 2
    assert got[1]["rejected_event_id"] == 7
    assert got[1]["margin_cents"] == 400
    assert got[4]["chosen_event_id"] == 11
    assert got[4]["rejected_event_id"] == 10
    assert got[4]["chosen_cents"] == 900 and got[4]["rejected_cents"] == 50


def test_stream_index_ingest_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (fresh checkpoint, same feed, same batch ids)
    overwrites its own batch=<id> subdirs with identical content — the
    probe answer and the folded corpus stats must not change."""
    from lakeflow.catalog import load_table
    from lakeflow.operators.text import bm25_indexed_topk
    from lakeflow.sources.streams import file_stream
    from lakeflow.streaming.sinks import stream_index_ingest

    import glob
    import os
    import shutil

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    part = str(tmp_path / "part")
    docs.coalesce(1).write.mode("overwrite").parquet(part)
    dst = f"{feed}/000.parquet"
    shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
    os.utime(dst, (1_700_000_000,) * 2)

    idx = str(tmp_path / "idx")
    schema = "doc_id bigint, text string"
    stream_index_ingest(
        file_stream(spark, feed, schema, max_files_per_trigger=1), idx
    ).awaitTermination()
    first = sorted(
        map(tuple, bm25_indexed_topk(spark, idx, ["spark", "join"]).collect())
    )
    n_stat_rows = spark.read.parquet(f"{idx}/corpus_stats").count()

    # replay: fresh checkpoint reprocesses the same file as batch 0 again
    stream_index_ingest(
        file_stream(spark, feed, schema, max_files_per_trigger=1), idx
    ).awaitTermination()
    again = sorted(
        map(tuple, bm25_indexed_topk(spark, idx, ["spark", "join"]).collect())
    )
    assert again == first
    assert spark.read.parquet(f"{idx}/corpus_stats").count() == n_stat_rows


def test_compact_text_index_preserves_probe_and_shrinks_files(spark, tmp_path):
    """Compaction folds batch shards into the one-shot layout: the probe
    answer is bit-identical, corpus partials collapse to one row, and the
    postings file count drops."""
    import glob

    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators.text import (
        append_to_text_index,
        bm25_indexed_topk,
        build_text_index,
        compact_text_index,
    )

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = str(tmp_path / "idx")
    build_text_index(docs.filter(F.col("doc_id") % 2 == 0), idx)
    append_to_text_index(docs.filter(F.col("doc_id") % 2 == 1), idx)
    before = sorted(
        map(tuple, bm25_indexed_topk(spark, idx, ["spark", "join"]).collect())
    )
    files_before = len(glob.glob(f"{idx}/postings/*.parquet"))
    # Batch partials exist pre-compaction (one corpus-stats row per ingest).
    assert spark.read.parquet(f"{idx}/corpus_stats").count() == 2
    # Indexes written before document frequency became probe-derived carry
    # an orphaned term_stats shard set; compaction is the one-shot cleanup.
    import os

    os.makedirs(f"{idx}/term_stats", exist_ok=True)
    open(f"{idx}/term_stats/legacy.parquet", "w").close()

    compact_text_index(spark, idx)
    after = sorted(
        map(tuple, bm25_indexed_topk(spark, idx, ["spark", "join"]).collect())
    )
    assert after == before
    assert len(glob.glob(f"{idx}/postings/*.parquet")) < files_before
    assert spark.read.parquet(f"{idx}/corpus_stats").count() == 1
    assert not os.path.exists(f"{idx}/term_stats")


def test_append_positions_mismatch_raises(spark, tmp_path):
    """ADVICE r8: include_positions must MATCH the built index, enforced at
    the append site — tf-only rows appended to a positional index would
    silently null out phrase search over the new documents."""
    import pytest
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table
    from lakeflow.operators.text import append_to_text_index, build_text_index

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    rest = docs.filter(F.col("doc_id") % 2 == 1)

    pos_idx = str(tmp_path / "pos_idx")
    build_text_index(half, pos_idx, include_positions=True)
    with pytest.raises(ValueError, match="include_positions=False disagrees"):
        append_to_text_index(rest, pos_idx, include_positions=False)

    tf_idx = str(tmp_path / "tf_idx")
    build_text_index(half, tf_idx, include_positions=False)
    with pytest.raises(ValueError, match="include_positions=True disagrees"):
        append_to_text_index(rest, tf_idx, include_positions=True)
    # Matching appends still work on both layouts.
    append_to_text_index(rest, pos_idx, include_positions=True)
    append_to_text_index(rest, tf_idx, include_positions=False)
    assert "positions" in spark.read.parquet(f"{pos_idx}/postings").columns
    assert "positions" not in spark.read.parquet(f"{tf_idx}/postings").columns


def test_append_propagates_corrupt_index_read_errors(spark, tmp_path):
    """ADVICE r9: only a genuinely ABSENT postings dir may act as a first
    build. A present-but-unreadable index (corrupt footer, transient IO)
    must propagate — swallowing it would skip the mixed-schema check and
    silently append build-shaped rows into a broken index."""
    import glob
    import os

    import pytest

    from lakeflow.operators.text import append_to_text_index

    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello spark")], "doc_id bigint, text string"
    )
    # Absent dir: first append acts as a build.
    append_to_text_index(docs, idx)
    parts = glob.glob(f"{idx}/postings/*.parquet")
    assert parts

    # Corrupt every postings file: the next append must FAIL LOUDLY, and
    # must not have touched corpus_stats before failing.
    for p in parts:
        with open(p, "wb") as fh:
            fh.write(b"not a parquet footer")
    stats_before = sorted(os.listdir(f"{idx}/corpus_stats"))
    more = spark.createDataFrame([(3, "late doc")], "doc_id bigint, text string")
    with pytest.raises(Exception) as ei:
        append_to_text_index(more, idx)
    assert "include_positions" not in str(ei.value)  # real error, not the gate
    assert sorted(os.listdir(f"{idx}/corpus_stats")) == stats_before


def test_phrase_match_repeated_and_long_phrases(spark, tmp_path):
    """Positional phrase matching on crafted docs: repeated-token phrases
    need genuinely distinct adjacent occurrences, 3-term chains count
    overlapping matches, absent phrases emit nothing."""
    from lakeflow.operators.text import build_text_index, phrase_match

    docs = spark.createDataFrame(
        [
            (1, "batch batch batch stream"),   # 'batch batch' x2 (overlapping)
            (2, "batch stream batch"),          # no 'batch batch'
            (3, "a table scan plan table scan"),  # 'table scan' x2
            (4, "table plan scan"),              # no phrase
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx, include_positions=True)

    bb = {r.doc_id: r.n_phrase for r in phrase_match(spark, idx, ["batch", "batch"]).collect()}
    assert bb == {1: 2}
    ts = {r.doc_id: r.n_phrase for r in phrase_match(spark, idx, ["table", "scan"]).collect()}
    assert ts == {3: 2}
    bbb = {r.doc_id: r.n_phrase for r in phrase_match(spark, idx, ["batch", "batch", "batch"]).collect()}
    assert bbb == {1: 1}
    assert phrase_match(spark, idx, ["scan", "table"]).collect() == [
        r for r in phrase_match(spark, idx, ["scan", "table"]).collect()
    ]  # deterministic
    assert {r.doc_id for r in phrase_match(spark, idx, ["stream", "batch"]).collect()} == {2}


def test_boolean_search_or_and_not(spark, tmp_path):
    """OR unions dedup, AND chains semi joins, NOT anti-joins — crafted
    docs pin every branch."""
    from lakeflow.operators.text import boolean_search, build_text_index

    docs = spark.createDataFrame(
        [
            (1, "spark join window"),
            (2, "spark join batch"),
            (3, "spark batch"),
            (4, "join join spark spark"),
            (5, "window batch"),
        ],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "idx")
    build_text_index(docs, idx)

    got = {r.doc_id for r in boolean_search(spark, idx, must=["spark", "join"], must_not=["window"]).collect()}
    assert got == {2, 4}
    got = {r.doc_id for r in boolean_search(spark, idx, should=["window", "batch"]).collect()}
    assert got == {1, 2, 3, 5}
    got = {r.doc_id for r in boolean_search(spark, idx, should=["window", "batch"], must=["spark"]).collect()}
    assert got == {1, 2, 3}
    import pytest as _pt
    with _pt.raises(ValueError):
        boolean_search(spark, idx, must_not=["spark"])


def test_cms_estimate_upper_bounds_and_merges(spark):
    """CMS invariants: est ≥ exact for every key, and per-shard cell
    partials summed equal the whole-input sketch (mergeability — the
    property incremental maintenance relies on)."""
    from pyspark.sql import functions as F

    from lakeflow.operators.aggregates import cms_cells, cms_point_estimate

    rows = [(k,) for k in ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"] * 1]
    df = spark.createDataFrame(rows, "k string")
    cells = cms_cells(df, "k", depth=3, width=8)
    est = {
        r.k: r.est_cnt
        for r in cms_point_estimate(
            cells, df.distinct(), "k", depth=3, width=8
        ).collect()
    }
    exact = {r.k: r.n for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)

    # Mergeability: sketch(shard1) + sketch(shard2) == sketch(union).
    half1 = spark.createDataFrame([(k,) for k in ["a"] * 30 + ["b"] * 10], "k string")
    half2 = spark.createDataFrame(
        [(k,) for k in ["a"] * 20 + ["b"] * 10 + ["c"] * 5 + ["d"] * 1], "k string"
    )
    merged = (
        cms_cells(half1, "k", depth=3, width=8)
        .unionByName(cms_cells(half2, "k", depth=3, width=8))
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_cells(df, "k", depth=3, width=8)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_template_fingerprint_collapses_digit_variants(spark):
    """Digit runs, case, and whitespace shape fold into one template;
    genuinely different words do not."""
    from lakeflow.operators.dedup import fingerprint, template_fingerprint

    docs = spark.createDataFrame(
        [
            (1, "Invoice 12345 total $99.10"),
            (2, "invoice 777 total   $3.5"),
            (3, "Invoice 12345\ttotal $99.10\n"),
            (4, "Receipt 12345 total $99.10"),
        ],
        "doc_id long, text string",
    )
    out = docs.select(
        "doc_id",
        template_fingerprint("text").alias("tfp"),
        fingerprint("text").alias("fp"),
    ).collect()
    tfp = {r.doc_id: r.tfp for r in out}
    fp = {r.doc_id: r.fp for r in out}
    assert tfp[1] == tfp[2] == tfp[3]      # numbers + whitespace fold
    assert tfp[4] != tfp[1]                # different word: different template
    assert fp[1] != fp[2]                  # exact fingerprint keeps them apart


def test_stream_cms_ingest_folds_and_replays_idempotently(spark, tmp_path):
    """Cell partials landed per micro-batch fold to the whole-input sketch
    (mergeability through the streaming path, multiple real batches), and a
    replayed run (fresh checkpoint, same feed, same batch ids) overwrites
    its own batch=<id> subdirs without double-counting."""
    import glob
    import os
    import shutil

    from lakeflow.operators.aggregates import cms_cells, read_cms_cells
    from lakeflow.sources.streams import file_stream
    from lakeflow.streaming.sinks import stream_cms_ingest

    rows = [(k,) for k in ["a"] * 40 + ["b"] * 15 + ["c"] * 3]
    df = spark.createDataFrame(rows, "k string")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    # two source files -> two micro-batches under maxFilesPerTrigger=1
    part1 = str(tmp_path / "p1")
    part2 = str(tmp_path / "p2")
    spark.createDataFrame(rows[:30], "k string").coalesce(1).write.parquet(part1)
    spark.createDataFrame(rows[30:], "k string").coalesce(1).write.parquet(part2)
    for i, part in enumerate([part1, part2]):
        dst = f"{feed}/{i:03d}.parquet"
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i,) * 2)

    sketch = str(tmp_path / "sketch")
    stream_cms_ingest(
        file_stream(spark, feed, "k string", max_files_per_trigger=1),
        sketch,
        "k",
        depth=3,
        width=8,
    ).awaitTermination()
    batch_dirs = glob.glob(f"{sketch}/cells/batch=*")
    assert len(batch_dirs) == 2, batch_dirs

    folded = {tuple(r) for r in read_cms_cells(spark, sketch).collect()}
    whole = {
        tuple(r) for r in cms_cells(df, "k", depth=3, width=8).collect()
    }
    assert folded == whole

    # replay with a fresh checkpoint: same files, same batch ids, no change
    stream_cms_ingest(
        file_stream(spark, feed, "k string", max_files_per_trigger=1),
        sketch,
        "k",
        depth=3,
        width=8,
    ).awaitTermination()
    again = {tuple(r) for r in read_cms_cells(spark, sketch).collect()}
    assert again == whole


def test_golden_record_survivorship_rules(spark):
    """Hand-computed ER survivorship: two matched members fold into one
    golden record with name-from-lowest-key, max balance, and the
    segment of the richest member."""
    from pyspark.sql import functions as F

    from lakeflow.operators.dedup import dup_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    cust = spark.createDataFrame(
        [
            (1, "acme corp", 10.0, "SEG_A"),
            (2, "acme c0rp", 99.0, "SEG_B"),
            (3, "unrelated", 5.0, "SEG_C"),
        ],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )
    clusters = dup_clusters(pairs)
    members = cust.join(
        clusters, cust["c_custkey"] == clusters["id"], "left"
    ).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment",
        F.coalesce("cluster_id", "c_custkey").alias("cluster_id"),
    )
    rich = (
        F.floor(F.col("c_acctbal") * 100.0 + F.lit(0.5)).cast("bigint")
        * F.lit(1000000) + F.col("c_custkey")
    )
    golden = (
        members.groupBy("cluster_id")
        .agg(
            F.min_by("c_name", "c_custkey").alias("canonical_name"),
            F.count(F.lit(1)).alias("n"),
            F.max("c_acctbal").alias("best"),
            F.max_by("c_mktsegment", rich).alias("seg"),
        )
        .filter(F.col("n") > 1)
        .collect()
    )
    assert len(golden) == 1
    g = golden[0]
    assert (g["cluster_id"], g["canonical_name"], g["n"], g["best"], g["seg"]) == (
        1, "acme corp", 2, 99.0, "SEG_B"
    )


def test_pipeline_resume_skips_completed_tasks():
    """Airflow's clear-failed-and-rerun: a second run fed the first run's
    report skips every succeeded task and re-executes only the failed one
    and its dependents (state flows through side effects, not results)."""
    from lakeflow.plans.runner import Pipeline

    executed: list[str] = []
    state: dict[str, int] = {}
    flaky = {"fail": True}

    p = Pipeline("resume")

    @p.task("extract")
    def extract(res):
        executed.append("extract")
        state["raw"] = 10
        return None

    @p.task("transform", deps=["extract"])
    def transform(res):
        executed.append("transform")
        if flaky["fail"]:
            raise RuntimeError("boom")
        state["clean"] = state["raw"] * 2
        return None

    @p.task("load", deps=["transform"])
    def load(res):
        executed.append("load")
        state["out"] = state["clean"] + 1
        return None

    p.run(on_error="skip_downstream")
    first = dict(p.report)
    assert first["extract"]["status"] == "success"
    assert first["transform"]["status"] == "failed"
    assert first["load"]["status"] == "upstream_failed"

    flaky["fail"] = False
    executed.clear()
    p.run(resume_from=first)
    assert executed == ["transform", "load"], executed
    assert p.report["extract"]["status"] == "skipped_done"
    assert p.report["transform"]["status"] == "success"
    assert state["out"] == 21


def test_sq8_quantization_properties_and_recall(spark):
    """Scalar int8 quantization: values stay in [-127, 127], a zero vector
    quantizes to zeros, the per-vector max-abs component hits exactly ±127,
    and the quantized ranking recovers >=90% of the float brute-force
    top-5 pairs on the fixture (rounding is the only error source)."""
    from .conftest import SF_DIR

    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import (
        brute_force_topk,
        sq8_quantize,
        sq8_topk,
    )

    crafted = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id int, embedding array<float>",
    )
    rows = {r.vec_id: list(r.qvec) for r in sq8_quantize(crafted).collect()}
    assert rows[1] == [64, -127, 32]  # floor(x/maxabs*127 + .5)
    assert rows[2] == [0, 0, 0]

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.qid, r.vid) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.qid, r.vid) for r in sq8_topk(emb, q, k=5).collect()}
    assert len(exact & approx) >= 0.9 * len(exact)
    bounds = sq8_quantize(emb).select(
        F.min(F.array_min("qvec")).alias("lo"),
        F.max(F.array_max("qvec")).alias("hi"),
    ).collect()[0]
    assert -127 <= bounds.lo and bounds.hi <= 127


def test_stream_ann_ingest_replay_idempotent_and_matches_batch_ivf(
    spark, tmp_path
):
    """The streamed IVF cells must (a) answer bit-identically to the batch
    ivf_topk over the same corpus (per-vector assignment is independent of
    micro-batching) and (b) be replay-idempotent — a fresh checkpoint
    reprocessing the same feed overwrites batch=<id> subdirs with identical
    content instead of double-ingesting vectors."""
    import glob
    import os
    import shutil

    from lakeflow.catalog import load_table
    from lakeflow.operators.similarity import ivf_probe_cells, ivf_topk
    from lakeflow.sources.streams import file_stream
    from lakeflow.streaming.sinks import stream_ann_ingest

    from .conftest import SF_DIR

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    part = str(tmp_path / "part")
    emb.coalesce(1).write.mode("overwrite").parquet(part)
    dst = f"{feed}/000.parquet"
    shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
    os.utime(dst, (1_700_000_000,) * 2)

    centroids = emb.filter(F.col("vec_id") < 16)
    queries = emb.filter(F.col("vec_id") < 10)
    cells = str(tmp_path / "cells")
    schema = "vec_id bigint, embedding array<float>"
    stream_ann_ingest(
        file_stream(spark, feed, schema, max_files_per_trigger=1),
        cells,
        centroids,
    ).awaitTermination()

    streamed = sorted(
        map(
            tuple,
            ivf_probe_cells(
                spark, cells, queries, centroids, k=5, n_probe=4
            ).collect(),
        )
    )
    batch = sorted(
        map(tuple, ivf_topk(emb, queries, centroids, k=5, n_probe=4).collect())
    )
    assert streamed == batch

    # Replay with a fresh checkpoint: same batch id, same content, no dups.
    stream_ann_ingest(
        file_stream(spark, feed, schema, max_files_per_trigger=1),
        cells,
        centroids,
    ).awaitTermination()
    again = sorted(
        map(
            tuple,
            ivf_probe_cells(
                spark, cells, queries, centroids, k=5, n_probe=4
            ).collect(),
        )
    )
    assert again == streamed
    n_rows = spark.read.parquet(cells).count()
    assert n_rows == emb.count()  # every vector exactly once
