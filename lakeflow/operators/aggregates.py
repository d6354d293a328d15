"""Aggregation operators (SURVEY.md §2.4) — flagship: OHLCV candle roll-up.

The reference's streaming candle aggregation
(/root/reference/src/silver/ohlcv_agg.py:17-38) uses arrival-order
``first``/``last`` for open/close — nondeterministic. We fix the semantics to
event-time ``min_by``/``max_by`` (SURVEY.md §7.4): deterministic, identical in
batch and streaming, and reproducible by any SQL oracle.

Scale: a single hash aggregation — partial (map-side) combine happens for every
one of these agg functions, so the shuffle carries one row per
(key, window) per map task, not per input row. This is the plan you want at
100 TB; no window function, no second sort.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.rounding import rnd


def tumbling_candles(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    window_duration: str = "15 minutes",
    round_to: int | None = 2,
) -> DataFrame:
    """Batch tumbling-window OHLCV candles, deterministic open/close.

    Output: key cols, ``bucket_start`` (window start as 'yyyy-MM-dd HH:mm:ss'
    string — engine-neutral), open/high/low/close/volume/n_events.
    """
    w = F.window(F.col(ts_col), window_duration)

    def r(c: Column) -> Column:
        return rnd(c, round_to) if round_to is not None else c

    return (
        df.groupBy(*key_cols, w.alias("__w"))
        .agg(
            r(F.min_by(value_col, ts_col)).alias("open"),
            r(F.max(value_col)).alias("high"),
            r(F.min(value_col)).alias("low"),
            r(F.max_by(value_col, ts_col)).alias("close"),
            r(F.sum(value_col)).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("bucket_start", F.date_format("__w.start", "yyyy-MM-dd HH:mm:ss"))
        .drop("__w")
        .select(*key_cols, "bucket_start", "open", "high", "low", "close", "volume", "n_events")
    )


def scalar_max(df: DataFrame, col: str):
    """High-watermark scalar: MAX(col) (reference _silver_utils.py:45).

    Parquet/Iceberg footer statistics make this near-free via aggregate
    pushdown; still a single-row collect either way.
    """
    return df.agg(F.max(col).alias("hw")).collect()[0]["hw"]


def is_empty(df: DataFrame) -> bool:
    """Emptiness probe (replaces the reference's df.rdd.isEmpty(),
    /root/reference/src/silver/processed_company.py:69)."""
    return df.isEmpty()


def grouped_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[Column],
    *,
    mode: str = "groupby",
) -> DataFrame:
    """Uniform entry for groupBy / rollup / cube aggregation (headroom §2.4)."""
    if mode == "groupby":
        g = df.groupBy(*keys)
    elif mode == "rollup":
        g = df.rollup(*keys)
    elif mode == "cube":
        g = df.cube(*keys)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return g.agg(*aggs)


def salted_two_phase_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, str],
    n_salts: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial-aggregate on
    (keys, salt), then final-aggregate on keys.

    Spark's hash aggregate already does map-side partial combine, but a single
    reducer still owns each final key — a hot key serializes there. The salt
    spreads a hot key over n_salts reducers in phase 1; phase 2 combines
    n_salts tiny rows per key. Only algebraic aggregates compose:
    ``aggs`` maps column → one of sum|count|min|max.

    Output columns: keys + ``<agg>_<col>`` (e.g. ``sum_value``).
    """
    phase2 = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salt = F.floor(F.rand(seed) * n_salts).cast("int")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how](c).alias(
                f"{how}_{c}"
            )
            for c, how in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            phase2[how](f"{how}_{c}").alias(f"{how}_{c}")
            for c, how in aggs.items()
        ]
    )


def _cms_bucket(key: Column, seed: int, width: int) -> Column:
    """Row-hash for one CMS depth: md5 over a seed-prefixed key, reduced to
    [0, width). md5 (not xxhash64) so any engine can replay the sketch
    bit-for-bit — the same portability call as the sampling operators."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % width
    ).alias("bucket")


def cms_cells(
    df: DataFrame, key_col: str, *, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch as a MERGEABLE aggregate frame: (seed, bucket, cnt).

    The sketch is just a keyed count over depth×width cells, so Spark's map-
    side partial combine IS the sketch update: each map task emits at most
    depth·width rows regardless of input size, and partials from different
    partitions / days / tables merge by summing cnt — the same
    incremental-maintenance story as the Datasketches HLL partials
    (``hll_partial_merge_verdict``), but for FREQUENCY instead of
    cardinality, with constant memory independent of key cardinality.
    Unlike Spark's built-in ``count_min_sketch`` (opaque JVM bytes, no SQL
    merge), this layout is engine-portable and oracle-replayable.

    Estimates upper-bound true counts: est(k) = min over seeds of
    cell(seed, bucket(k)) ≥ exact(k), overshoot ≤ collisions ≈ n/width
    per seed (minimized over ``depth`` independent hashes).
    """
    key = F.col(key_col).cast("string")
    pairs = F.array(
        *[
            F.struct(
                F.lit(str(s)).alias("seed"), _cms_bucket(key, s, width)
            )
            for s in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("c"))
        .groupBy(F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimate(
    cells: DataFrame,
    candidates: DataFrame,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query a CMS cell frame for each candidate key.

    ``cells`` is at most depth·width rows however big the sketched input
    was, so it broadcasts; the probe is a broadcast hash join plus a
    per-key min — the candidate set is never shuffled against the corpus.
    Returns (key_col, est_cnt).
    """
    key = F.col(key_col).cast("string")
    probes = candidates.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(str(s)).alias("seed"), _cms_bucket(key, s, width)
                    )
                    for s in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.seed").alias("seed"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def read_cms_cells(spark, sketch_dir: str) -> DataFrame:
    """Fold per-batch CMS cell partials (``stream_cms_ingest`` layout) into
    the current sketch: partials merge by summing, so the whole read is one
    ≤depth·width-row aggregate however many batches have landed."""
    return (
        spark.read.parquet(f"{sketch_dir}/cells")
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_partials(
    df: DataFrame,
    value_col: str,
    *,
    width: float,
    part_cols: Sequence[str] = (),
) -> DataFrame:
    """Fixed-width histogram as a MERGEABLE quantile-sketch partial:
    (part_cols..., bin, cnt).

    The third leg of the sketch family (HLL = cardinality, CMS = frequency,
    this = DISTRIBUTION): ``bin = floor(value / width)`` is a deterministic
    integer, so a histogram is just a keyed count — Spark's map-side partial
    combine IS the sketch update, each map task emits at most one row per
    occupied bin, and partials from different partitions / days / tables
    merge by summing ``cnt``. Quantile estimates from the merged bins are
    correct to ±``width`` — the incremental-maintenance answer to "p99 over
    100 TB without rescanning history" (store per-day partials in a silver
    table; only the new day is ever scanned again). Unlike Spark's
    ``percentile_approx`` (opaque JVM digest, no SQL merge), the cell layout
    is engine-portable and oracle-replayable bit-for-bit.
    """
    b = F.floor(F.col(value_col) / F.lit(width)).cast("bigint").alias("bin")
    return (
        df.groupBy(*part_cols, b)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histograms(partials: DataFrame) -> DataFrame:
    """Fold histogram partials (any partitioning of the input) into the
    global sketch: sum per bin — ≤ (range/width) rows however large the
    sketched input was."""
    return partials.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    bins: DataFrame, qs: Sequence[float], *, width: float
) -> DataFrame:
    """Quantile estimates from a merged histogram frame: for each q the
    upper edge of the first bin whose cumulative count reaches
    ``ceil(q * total)``. Output (q, approx_value); error ≤ ``width``.

    The bin frame is tiny (≤ range/width rows), so the running sum's
    single-partition window is fine — the heavy lifting already happened in
    the mergeable partial aggregation.
    """
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    q_df = bins.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    return (
        cum.crossJoin(q_df)
        .where(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy("q")
        .agg(
            ((F.min("bin") + 1) * F.lit(width)).alias("approx_value")
        )
    )


def read_histogram_bins(spark, sketch_dir: str) -> DataFrame:
    """Fold per-batch histogram partials (``stream_histogram_ingest``
    layout) into the current sketch: bins merge by summing, so the read is
    one ≤(range/width)-row aggregate however many batches have landed —
    the distribution-sketch sibling of ``read_cms_cells``."""
    return (
        spark.read.parquet(f"{sketch_dir}/bins")
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def kmv_uniform(col: Column) -> Column:
    """Deterministic uniform in (0,1) for a distinct item — the KMV hash.

    Same md5 derivation as ``stratified_hash_sample``/``weighted_hash_sample``
    (first 8 hex chars → 32-bit int → ``(h + 0.5) / 2^32``), so the value is
    bit-identical in any engine that has md5 and IEEE doubles — the property
    that lets a DuckDB oracle replay the sketch exactly, which HLL's opaque
    JVM registers never allow.
    """
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    return (h + F.lit(0.5)) / F.lit(4294967296.0)


def kmv_minima(
    df: DataFrame,
    item_col: str,
    k: int,
    *,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The k smallest distinct item hashes per group — the KMV (k-minimum-
    values / bottom-k theta) cardinality sketch, fourth leg of the sketch
    family (HLL = cardinality-opaque, CMS = frequency, histogram =
    distribution, KMV = cardinality WITH set algebra): unions, intersections
    and Jaccard fall out of comparing minima sets, which HLL cannot do
    without error blowup.

    Output: (group_cols..., u) — ≤ k rows per group. Shape: distinct on
    (group, u) gets a map-side partial, then the per-group bottom-k window
    is pruned map-side by Spark's WindowGroupLimit before the one shuffle,
    so the shuffle carries ≤ k rows per group per map task, never the
    distinct item set. Deterministic: the sketch of a dataset is a pure
    function of its item set — mergeable by construction (global bottom-k
    == bottom-k of unioned per-partition bottom-k's, exactly).
    """
    from pyspark.sql import Window

    gcols = list(group_cols)
    u = kmv_uniform(F.col(item_col)).alias("u")
    hashed = df.select(*gcols, u).distinct()
    w = Window.partitionBy(*gcols).orderBy("u") if gcols else Window.orderBy("u")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    minima: DataFrame, k: int, *, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Distinct-count estimate from a KMV minima frame: if a group holds
    fewer than k minima the count is EXACT (the sketch saw every distinct
    item); otherwise the classic unbiased estimator ``(k-1) / u_(k)``.
    Output (group_cols..., sketch_size, est_distinct); relative error
    ~ 1/sqrt(k-2). Both branches are plain arithmetic over the minima, so
    the estimate is engine-reproducible to the bit.
    """
    gcols = list(group_cols)
    agg = minima.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("sketch_size"),
        F.max("u").alias("__kth"),
    )
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__kth"))
    return agg.select(
        *gcols, "sketch_size", rnd(est, 4).alias("est_distinct")
    )


def kmv_set_ops(
    minima_a: DataFrame, minima_b: DataFrame, k: int
) -> DataFrame:
    """Set algebra over two KMV sketches — the operation HLL can't do:
    estimate |A ∪ B|, Jaccard(A, B) and |A ∩ B| from the two minima sets
    alone, never re-touching the sketched data.

    Method (Beyer et al. / theta-sketch folklore): take K = the k smallest
    of ``minima_a ∪ minima_b`` — K is exactly the KMV sketch of A ∪ B, so
    ``(k-1)/max(K)`` estimates the union; the fraction of K present in BOTH
    input sketches is an unbiased Jaccard estimate; intersection =
    jaccard × union. Inputs are ≤ k rows each, so every step here is
    arithmetic over ≤ 2k rows — the single-partition window is fine.
    Output: 1 row (union_est, jaccard, intersect_est), all round(4).
    """
    from pyspark.sql import Window

    both = (
        minima_a.select("u", F.lit(1).alias("__a"), F.lit(0).alias("__b"))
        .unionAll(
            minima_b.select("u", F.lit(0).alias("__a"), F.lit(1).alias("__b"))
        )
        .groupBy("u")
        .agg(F.max("__a").alias("in_a"), F.max("__b").alias("in_b"))
    )
    topk = (
        both.withColumn("__rn", F.row_number().over(Window.orderBy("u")))
        .filter(F.col("__rn") <= k)
    )
    agg = topk.agg(
        F.count(F.lit(1)).alias("__n"),
        F.max("u").alias("__kth"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("__shared"),
    )
    union_est = F.when(
        F.col("__n") < k, F.col("__n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__kth"))
    jaccard = F.col("__shared") / F.col("__n")
    return agg.select(
        rnd(union_est, 4).alias("union_est"),
        rnd(jaccard, 4).alias("jaccard"),
        rnd(jaccard * union_est, 4).alias("intersect_est"),
    )


def kmv_join_cardinality(
    df_a: DataFrame,
    key_a: str,
    df_b: DataFrame,
    key_b: str,
    k: int,
) -> DataFrame:
    """Equi-join output-cardinality estimate from KMV sketches — the
    planner question (`stats_planned_join` decides broadcast from manifest
    BYTES; this estimates join ROWS) answered without touching either
    table's key set: sketch both join keys, estimate the distinct overlap
    via :func:`kmv_set_ops`' Jaccard×union, and apply the classic
    uniform-frequency model ``rows ≈ (n_a/d_a) · (n_b/d_b) · d_∩``.

    One scan per side (count + sketch), then arithmetic over ≤ 2k doubles —
    at 100 TB the sketches are maintained incrementally per commit
    (merge_kmv_minima over per-day partials), so the planner never pays a
    scan at all. Output one row: per-side row counts, distinct estimates,
    overlap estimate and the join-rows estimate, all round(4)."""
    from pyspark.sql import functions as F

    sk_a = kmv_minima(df_a, key_a, k)
    sk_b = kmv_minima(df_b, key_b, k)
    est_a = kmv_estimate(sk_a, k).select(
        F.col("est_distinct").alias("d_a")
    )
    est_b = kmv_estimate(sk_b, k).select(
        F.col("est_distinct").alias("d_b")
    )
    inter = kmv_set_ops(sk_a, sk_b, k).select(
        F.col("intersect_est").alias("d_inter")
    )
    n_a = df_a.agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
    n_b = df_b.agg(F.count(F.lit(1)).cast("bigint").alias("n_b"))
    est_rows = (
        (F.col("n_a") / F.col("d_a"))
        * (F.col("n_b") / F.col("d_b"))
        * F.col("d_inter")
    )
    return (
        n_a.crossJoin(n_b)
        .crossJoin(est_a)
        .crossJoin(est_b)
        .crossJoin(inter)
        .select(
            "n_a",
            "n_b",
            "d_a",
            "d_b",
            "d_inter",
            rnd(est_rows, 4).alias("est_join_rows"),
        )
    )


# Poisson(1) CDF at k = 0..7 (k=8 catches the ~1.1e-7 tail): the inverse-CDF
# thresholds that turn one md5 uniform into a bootstrap resample count.
_POISSON1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
    0.9999897508033253,
)


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    cents_col: str,
    n_reps: int = 32,
) -> DataFrame:
    """Bootstrap uncertainty for a mean WITHOUT resampling passes — the
    Poisson bootstrap (the distributed form: with-replacement resampling is
    a sequential draw, but each row's inclusion count in replicate b is
    ≈ Poisson(1), drawable independently per row). One scan explodes each
    row into (row, rep) with a deterministic count k = Poisson⁻¹(md5(id:rep))
    — so the whole B-replicate bootstrap is ONE combine-bounded aggregate
    (shuffle carries B rows per map task), reproducible across engines,
    runs and retries.

    ``cents_col`` must be an exact integer metric (e.g. price cents):
    replicate sums are then BIGINT — order-free — so replicate means are
    bit-identical in any engine, which float sums never are. Output one
    row: n_rows, point_mean, boot_lo/boot_hi (min/max replicate mean — the
    empirical bootstrap range), n_reps, contains_point."""
    # One md5 yields FOUR independent 32-bit uniforms (lanes of the 128-bit
    # digest), so replicate r draws from lane r%4 of md5(id:r//4).
    # Structurally: explode digest GROUPS first (n_reps/4 of them), hash
    # once per (row, group), THEN explode the four lanes off each digest —
    # md5 was 70% of the whole bootstrap when hashed per (row, rep)
    # (3.4 s of 4.8 s at 4.8M draws); this computes the identical uniforms
    # with a quarter of the hashes.
    n_grps = (int(n_reps) + 3) // 4
    grp = F.explode(F.sequence(F.lit(0), F.lit(n_grps - 1))).alias("grp")
    digested = df.select(
        F.col(cents_col).alias("__cents"), F.col(id_col), grp
    ).withColumn(
        "__digest",
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("grp").cast("string"),
            )
        ),
    )
    lane = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("lane")
    reps = digested.select("__cents", "grp", "__digest", lane).filter(
        F.col("grp") * 4 + F.col("lane") < int(n_reps)
    )
    h = F.conv(
        F.substring("__digest", F.col("lane") * 8 + 1, F.lit(8)), 16, 10
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)
    k = F.lit(8)
    for i in range(len(_POISSON1_CDF) - 1, -1, -1):
        k = F.when(u < F.lit(_POISSON1_CDF[i]), F.lit(i)).otherwise(k)
    per_rep = (
        reps.withColumn("__k", k)
        .groupBy((F.col("grp") * 4 + F.col("lane")).alias("rep"))
        .agg(
            F.sum(F.col("__k") * F.col("__cents")).alias("__ks"),
            F.sum("__k").alias("__kn"),
        )
        .select(
            rnd(
                F.col("__ks").cast("double")
                / (F.col("__kn").cast("double") * F.lit(100.0)),
                6,
            ).alias("__m")
        )
    )
    point = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        rnd(
            F.sum(cents_col).cast("double")
            / (F.count(F.lit(1)) * F.lit(100.0)),
            6,
        ).alias("point_mean"),
    )
    band = per_rep.agg(
        F.min("__m").alias("boot_lo"), F.max("__m").alias("boot_hi")
    )
    return point.crossJoin(band).select(
        "n_rows",
        "point_mean",
        "boot_lo",
        "boot_hi",
        F.lit(int(n_reps)).cast("bigint").alias("n_reps"),
        (
            (F.col("point_mean") >= F.col("boot_lo"))
            & (F.col("point_mean") <= F.col("boot_hi"))
        ).alias("contains_point"),
    )


def merge_kmv_minima(
    partials: DataFrame, k: int, *, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Fold KMV minima partials (any partitioning: per-batch, per-day,
    per-table) into the global sketch: distinct + bottom-k again. Because
    an item's hash never depends on what else was sketched, the fold
    recovers EXACTLY the sketch a single pass over the union would build —
    the mergeability contract the streaming ingest relies on."""
    from pyspark.sql import Window

    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy("u") if gcols else Window.orderBy("u")
    return (
        partials.select(*gcols, "u")
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
