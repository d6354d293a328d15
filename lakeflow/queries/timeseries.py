"""Time-series operators beyond the reference's surface (SURVEY.md §2.5/§2.8
headroom): as-of join, session windows, sliding windows, per-key regression
trend — the OHLCV/event-stream domain's natural extensions, each with a DuckDB
oracle (DuckDB's native ASOF JOIN / gaps-and-islands SQL replay them exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.functions.rounding import rnd, sql_rnd
from lakeflow.operators.joins import asof_join
from lakeflow.queries import register

_STRF = "%Y-%m-%d %H:%M:%S"
TS_FMT = "yyyy-MM-dd HH:mm:ss"


@register(
    "asof_purchase_view",
    oracle=f"""
    SELECT l.event_id, l.user_id, strftime(l.ts, '{_STRF}') AS ts_s,
           {sql_rnd('l.value', 2)} AS value,
           r.event_id AS prior_view_id,
           {sql_rnd('r.value', 2)} AS prior_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase picks up the user's most recent prior 'view'
    event (trades/quotes pattern). Implemented union+sort-once per key —
    one shuffle — rather than a range join (see operators.joins.asof_join)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_eid"), "ts", F.col("value").alias("v_val")
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"v_eid": "prior_view_id", "v_val": "prior_view_value"},
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts_s"),
        rnd("value", 2).alias("value"),
        "prior_view_id",
        rnd("prior_view_value", 2).alias("prior_view_value"),
    )


@register(
    "asof_salted_purchase_view",
    oracle=f"""
    SELECT l.event_id, l.user_id, strftime(l.ts, '{_STRF}') AS ts_s,
           {sql_rnd('l.value', 2)} AS value,
           r.event_id AS prior_view_id,
           {sql_rnd('r.value', 2)} AS prior_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_salted_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`asof_purchase_view` through the HOT-KEY TIME-BUCKET SALT (r11,
    VERDICT r10 ask #3): identical semantics and oracle, but the sort is
    partitioned by (user_id, day-bucket) with cross-bucket boundary
    seeding instead of one partition per user's full history — the form
    that survives a single user owning a partition-breaking share of a
    100 TB event stream. Same oracle as the unsalted twin: the salt is
    output-invariant by construction (skewed-fixture parity also pinned in
    tests/test_operators.py::test_asof_join_time_bucket_salt_parity)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("v_eid"), "ts", F.col("value").alias("v_val")
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"v_eid": "prior_view_id", "v_val": "prior_view_value"},
        time_bucket_seconds=86_400,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts_s"),
        rnd("value", 2).alias("value"),
        "prior_view_id",
        rnd("prior_view_value", 2).alias("prior_view_value"),
    )


@register(
    "session_windows_30m",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
        SELECT *, sum(new_session) OVER (
            PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
        ) AS session_no
        FROM marked
    )
    SELECT user_id,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
           count(*) AS n_events,
           {sql_rnd('sum(value)', 2)} AS sum_value
    FROM sessions GROUP BY user_id, session_no
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user — F.session_window,
    the dynamic-gap cousin of tumbling windows (streaming-capable; batch here
    for oracle parity). The oracle replays it as gaps-and-islands SQL."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros("__w.start").alias("session_start_us"),
            F.unix_micros("__w.end").alias("session_end_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_windows_30m15m",
    oracle=f"""
    SELECT event_type,
           strftime(time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE,
                    '{_STRF}') AS bucket_start,
           count(*) AS n_events,
           {sql_rnd('sum(value)', 2)} AS sum_value
    FROM events, UNNEST([0, 1]) AS t(k)
    GROUP BY event_type, 2
    """,
)
def sliding_windows_30m15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (30 min length, 15 min slide): every event lands in two
    overlapping windows. The oracle replicates Spark's window set by shifting
    the 15-minute tumbling bucket."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "30 minutes", "15 minutes").alias("__w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("__w.start", TS_FMT).alias("bucket_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "user_value_trend",
    oracle=f"""
    SELECT user_id,
           {sql_rnd("regr_slope(value, epoch_us(ts) / 1000000.0 - 1704067200.0)", 6)}
               AS slope,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of value over time via the built-in
    regr_slope aggregate (JVM-side; no UDF). Time is rebased to 2024-01-01
    seconds so the regression sums stay well-conditioned in double."""
    ev = load_table(spark, sf_dir, "events")
    x = F.unix_micros("ts") / F.lit(1000000.0) - F.lit(1704067200.0)
    return ev.groupBy("user_id").agg(
        rnd(F.regr_slope(F.col("value"), x), 6).alias("slope"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "gap_sessions_batch",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE OR
                         lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           (floor((sum(value)) * 100.0 + 0.5) / 100.0) AS total_value
    FROM sess GROUP BY user_id, session_no
    """,
)
def gap_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState sessionizer
    (stream_gap_sessions): 30-minute-gap sessions via lag + running sum of
    session-start markers — the classic two-window sessionization. Gives the
    custom stateful operator an exact, oracle-checked semantic reference."""
    from pyspark.sql import functions as F

    from lakeflow.catalog import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                > 30 * 60
            ),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        rnd(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "interpolated_hourly_value",
    oracle="""
    WITH cents AS (
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events
    ),
    present AS (
        SELECT user_id, bucket, (sum(c) / count(*)) / 100.0 AS v
        FROM cents GROUP BY 1, 2
    ),
    spans AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM present GROUP BY 1),
    spine AS (
        SELECT user_id, unnest(generate_series(lo, hi, 3600)) AS bucket FROM spans
    ),
    j AS (
        SELECT s.user_id, s.bucket, p.v
        FROM spine s LEFT JOIN present p USING (user_id, bucket)
    ),
    w AS (
        SELECT user_id, bucket, v,
               last_value(v IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
               first_value(v IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
                   (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        FROM j
    )
    SELECT user_id, bucket, (v IS NOT NULL) AS observed,
           (floor((CASE WHEN v IS NOT NULL THEN v
                        WHEN pv IS NULL THEN nv
                        WHEN nv IS NULL THEN pv
                        ELSE pv + (nv - pv) * ((bucket - pb) / (nb - pb))
                   END) * 1000000.0 + 0.5) / 1000000.0) AS v
    FROM w
    """,
)
def interpolated_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular hourly grid per user: average event value per present hour
    (exact integer-cents so the per-bucket mean is order-free), then densify
    each user's span and fill gaps — linear interpolation between anchors,
    nearest-value at the edges (operators/timeseries.py). The standard
    feature-engineering step before any sequence model."""
    from lakeflow.operators.timeseries import densify_interpolate

    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "user_id",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint").alias("bucket"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("c"),
    )
    present = cents.groupBy("user_id", "bucket").agg(
        ((F.sum("c") / F.count(F.lit(1))) / 100.0).alias("v")
    )
    return densify_interpolate(
        present, key_col="user_id", bucket_col="bucket", val_col="v", step=3600
    )


@register(
    "asof_next_purchase",
    oracle=f"""
    WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    ranked AS (
        SELECT v.event_id AS view_id, v.user_id, v.ts AS v_ts,
               p.event_id AS pid, p.ts AS p_ts,
               row_number() OVER (PARTITION BY v.event_id
                                  ORDER BY p.ts, p.event_id) AS rn
        FROM v JOIN p ON v.user_id = p.user_id
                     AND p.ts >= v.ts
                     AND p.ts <= v.ts + INTERVAL 30 MINUTE
    )
    SELECT view_id, user_id, strftime(v_ts, '{_STRF}') AS view_ts,
           pid AS next_purchase_id,
           CAST(epoch_us(p_ts) - epoch_us(v_ts) AS BIGINT) AS gap_us
    FROM ranked WHERE rn = 1
    """,
)
def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (pandas merge_asof semantics): each view
    event attributes the user's NEXT purchase within 30 minutes — the
    first-touch attribution query, and the as-of counterpart of the
    stream-stream interval join (which keeps ALL pairs in the window; this
    keeps the first). Inner semantics: views with no purchase inside the
    tolerance drop out. Same union + sort-once-per-key plan as the backward
    form, with a descending in-partition sort."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_eid"),
        "ts",
    )
    joined = asof_join(
        views,
        purchases,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        payload={"p_eid": "next_purchase_id"},
        direction="forward",
        tolerance_seconds=30 * 60,
        how="inner",
    )
    # __match_ts is internal; recompute the gap from the purchase side via a
    # slim re-join on the attributed purchase id (broadcast at any scale:
    # the id->ts map is the purchase table's two columns).
    p_ts = purchases.select(
        F.col("p_eid").alias("next_purchase_id"), F.col("ts").alias("p_ts")
    )
    return (
        joined.join(p_ts, "next_purchase_id")
        .select(
            F.col("event_id").alias("view_id"),
            "user_id",
            F.date_format("ts", TS_FMT).alias("view_ts"),
            "next_purchase_id",
            (F.unix_micros("p_ts") - F.unix_micros("ts")).alias("gap_us"),
        )
    )


_EWMA_K = 8
_EWMA_LAGS = ",\n               ".join(
    f"lag(value, {i}) OVER win AS t{i}" for i in range(_EWMA_K)
)
_EWMA_NUM = "0.0"
_EWMA_DEN = "0.0"
for _i in range(_EWMA_K):
    _w = 0.5**_i
    _EWMA_NUM = f"({_EWMA_NUM} + COALESCE(t{_i} * {_w!r}, 0.0))"
    _EWMA_DEN = f"({_EWMA_DEN} + (CASE WHEN t{_i} IS NOT NULL THEN {_w!r} ELSE 0.0 END))"


@register(
    "ewma_user_value",
    oracle=f"""
    WITH lagged AS (
        SELECT event_id, user_id, value,
               {_EWMA_LAGS}
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id, value,
           (floor(({_EWMA_NUM} / {_EWMA_DEN}) * 1000000.0 + 0.5) / 1000000.0) AS ewma
    FROM lagged
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing EWMA smoothing (operators/timeseries.py::ewma_trailing):
    per-user decay-0.5 weighted average of the last 8 event values — the
    standard noise filter before per-entity thresholding. Power-of-two
    weights make every product exact in binary floating point, so Spark and
    the oracle agree bit-for-bit with no quantization step; one window, k
    incremental lag reads, no O(n²) frame."""
    from lakeflow.operators.timeseries import ewma_trailing

    return ewma_trailing(load_table(spark, sf_dir, "events"), k=_EWMA_K)


@register(
    "rolling_zscore_events",
    oracle="""
    WITH m AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm
        FROM events
    ),
    s AS (
        SELECT event_id, user_id, vm,
               count(vm) OVER w AS n,
               sum(vm) OVER w AS s1,
               sum(vm * vm) OVER w AS s2
        FROM m
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           (floor(((CAST(vm AS DOUBLE) - CAST(s1 AS DOUBLE) / 8.0)
               / sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 8.0) / 7.0))
               * 1000000.0 + 0.5) / 1000000.0) AS z
    FROM s WHERE n = 8
    """,
)
def rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores (operators/timeseries.py::
    rolling_zscore): each event's deviation from its user's previous 8
    values in sample standard deviations. Integer milli-unit sum /
    sum-of-squares accumulation makes the mean/variance — and hence every
    z — bit-identical across engines; one incremental window, no
    re-aggregation."""
    from lakeflow.operators.timeseries import rolling_zscore

    return rolling_zscore(load_table(spark, sf_dir, "events"), window=8)


@register(
    "asof_cogroup_pandas",
    oracle=f"""
    SELECT l.event_id, l.user_id, strftime(l.ts, '{_STRF}') AS ts_s,
           {sql_rnd('l.value', 2)} AS value,
           r.event_id AS prior_view_id,
           {sql_rnd('r.value', 2)} AS prior_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join again, but through the cogrouped-pandas API —
    ``df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas`` with a
    ``pd.merge_asof(by="user_id")`` inside — the §2.10 surface slot the
    JVM twin (``asof_purchase_view``, same oracle) doesn't exercise.

    The cogroup key is a coarse hash BUCKET of user_id, not user_id
    itself: grouping per user would cross the Python boundary once per
    user (sf0.1 spent 8.6s mostly on per-group invocation overhead),
    while ``merge_asof(by=...)`` does the per-user as-of inside one
    vectorized call per bucket. Bucket count bounds task count — the
    same knob that sizes tasks at 100 TB. Same oracle as the JVM twin,
    so the two implementations are pinned to each other through DuckDB's
    native ASOF JOIN."""
    import pandas as pd

    n_buckets = 64
    ev = load_table(spark, sf_dir, "events")
    bucket = F.pmod(F.hash("user_id"), F.lit(n_buckets)).alias("__b")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value", bucket
    )
    # The right key gets its own name: both sides derive from the same
    # scan, so an identically-named user_id shares its attribute id across
    # the cogroup and the plan rewriter collapses it out of the right frame.
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_uid"),
        F.col("event_id").alias("prior_view_id"),
        F.col("ts").alias("v_ts"),
        F.col("value").alias("prior_view_value"),
        bucket,
    )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                columns=[
                    "user_id", "event_id", "ts", "value",
                    "prior_view_id", "prior_view_value",
                ]
            )
        left = left.drop(columns=["__b"]).sort_values("ts", kind="mergesort")
        right = right.drop(columns=["__b"]).sort_values(
            "v_ts", kind="mergesort"
        )
        out = pd.merge_asof(
            left, right,
            left_on="ts", right_on="v_ts",
            left_by="user_id", right_by="v_uid",
            direction="backward",
        ).drop(columns=["v_ts", "v_uid"])
        # Arrow needs a nullable integer, not NaN-promoted float64.
        out["prior_view_id"] = out["prior_view_id"].astype("Int64")
        return out

    merged = (
        purchases.groupBy("__b")
        .cogroup(views.groupBy("__b"))
        .applyInPandas(
            merge,
            schema=(
                "user_id bigint, event_id bigint, ts timestamp, value double,"
                " prior_view_id bigint, prior_view_value double"
            ),
        )
    )
    return merged.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT).alias("ts_s"),
        rnd("value", 2).alias("value"),
        "prior_view_id",
        rnd("prior_view_value", 2).alias("prior_view_value"),
    )


@register(
    "user_value_median_pandas",
    oracle=f"""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           {sql_rnd('median(value)', 2)} AS med_value
    FROM events GROUP BY user_id
    """,
)
def user_value_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exact median through GROUPED-MAP ``applyInPandas`` — the
    plain grouped-map slot of the §2.10 pandas surface (scalar UDF, UDAF,
    UDTF, mapInPandas, mapInArrow, cogroup, and applyInPandasWithState are
    covered elsewhere). Median is deliberately the statistic: it is exact
    element-picking (plus one halving for even groups), so the Python path
    cannot drift a summation ulp against DuckDB's ``median`` the way a
    naive float mean could. One hash shuffle on user_id; each group's
    Arrow batch is sorted and indexed in pandas."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")

    def med(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf["value"].sort_values().reset_index(drop=True)
        n = len(vals)
        m = (
            vals[n // 2]
            if n % 2
            else (vals[n // 2 - 1] + vals[n // 2]) / 2.0
        )
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n_events": [n], "med_value": [m]}
        )

    out = ev.groupBy("user_id").applyInPandas(
        med, schema="user_id bigint, n_events bigint, med_value double"
    )
    return out.select("user_id", "n_events", rnd("med_value", 2).alias("med_value"))


@register(
    "sft_transcripts",
    oracle=f"""
    WITH turns AS (
        SELECT user_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS rn,
               (CASE WHEN (row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               )) % 2 = 1 THEN 'user' ELSE 'assistant' END)
               || ': [' || strftime(ts, '{_STRF}') || '] ' || event_type
               || ' value_cents='
               || CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)
                   AS line
        FROM events WHERE user_id < 40
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           string_agg(line, chr(10) ORDER BY rn) AS transcript
    FROM turns GROUP BY user_id
    """,
)
def sft_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation flattening for SFT data prep: each user's event stream
    becomes one training transcript — turns ordered by (ts, event_id),
    roles alternating user/assistant, every line deterministically
    rendered (formatted event time, integer cents). The whole render is
    Catalyst (row_number → concat → collect_list of (rn, line) structs →
    array_sort → array_join), one shuffle on the conversation key — the
    shape any chat-template rendering takes at corpus scale, where the
    transcript string is the training artifact. The oracle re-renders
    every line and the exact newline-joined concatenation, so a turn
    ordering, role parity, or formatting drift anywhere breaks the hash."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = F.row_number().over(w)
    line = F.concat(
        F.when(rn % 2 == 1, F.lit("user")).otherwise(F.lit("assistant")),
        F.lit(": ["),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
        F.lit("] "),
        F.col("event_type"),
        F.lit(" value_cents="),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("bigint")
        .cast("string"),
    )
    turns = ev.select("user_id", rn.alias("rn"), line.alias("line"))
    return turns.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("transcript"),
    )


@register(
    "preference_pairs",
    oracle="""
    WITH p AS (
        SELECT user_id, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id, event_id, c,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY c DESC, event_id ASC
               ) AS rc,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY c ASC, event_id ASC
               ) AS rr
        FROM p
    )
    SELECT ch.user_id,
           ch.event_id AS chosen_event_id,
           rj.event_id AS rejected_event_id,
           ch.c AS chosen_cents,
           rj.c AS rejected_cents,
           ch.c - rj.c AS margin_cents
    FROM (SELECT * FROM r WHERE rc = 1) ch
    JOIN (SELECT * FROM r WHERE rr = 1) rj USING (user_id)
    WHERE ch.c > rj.c
    """,
)
def preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF reward data: per prompt
    group (user), the best-valued response becomes `chosen` and the
    worst-valued `rejected`, with a strict-margin gate so ties never emit a
    pair. Values are fixed to integer cents BEFORE the argmax/argmin so
    float formatting can't flip a tie, and ties break on event_id via
    lexicographic struct ordering — fully deterministic on both engines.

    Plan shape: ONE shuffle on the prompt key with map-side partial min/max
    over (cents, event_id) structs — O(1) state per group. Deliberately NOT
    the window-rank formulation (which sorts every partition in full): at a
    100 TB event log, partial-aggregating two extrema per group is the plan
    that survives; sorting all events per prompt is not. The oracle takes
    the window-rank road (explicit ORDER BY makes its tie-break auditable),
    so the two independent formulations must agree pair-for-pair."""
    from lakeflow.operators.timeseries import dpo_pairs

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    p = ev.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        cents.alias("c"),
    )
    return dpo_pairs(p, "user_id", "event_id", "c")


@register(
    "m4_downsampled_events",
    oracle=f"""
    SELECT event_type,
           strftime(time_bucket(INTERVAL 1 HOUR, ts), '{_STRF}') AS bucket_start,
           strftime((min({{'t': ts, 'i': event_id, 'v': value}})).t, '{_STRF}')
               AS ts_first,
           (min({{'t': ts, 'i': event_id, 'v': value}})).v AS v_first,
           (min({{'v': value, 't': ts, 'i': event_id}})).v AS v_min,
           strftime((min({{'v': value, 't': ts, 'i': event_id}})).t, '{_STRF}')
               AS ts_min,
           (max({{'v': value, 't': ts, 'i': event_id}})).v AS v_max,
           strftime((max({{'v': value, 't': ts, 'i': event_id}})).t, '{_STRF}')
               AS ts_max,
           strftime((max({{'t': ts, 'i': event_id, 'v': value}})).t, '{_STRF}')
               AS ts_last,
           (max({{'t': ts, 'i': event_id, 'v': value}})).v AS v_last,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
    """,
)
def m4_downsampled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (first/last/min/max per pixel bucket — Jugel et al.,
    VLDB 2014) of the events feed at 1-hour resolution, keyed by
    event_type: the error-free way to render a 100 TB series on a screen,
    as ONE hash aggregation with map-side combine (vs the naive
    row_number-over-window plan, which sorts every row twice). Struct-
    ordered min/max with event_id tie-breaks make every selected point
    deterministic; the oracle replays the identical struct comparisons."""
    from lakeflow.operators.timeseries import m4_downsample

    return m4_downsample(
        load_table(spark, sf_dir, "events"),
        id_col="event_id",
        bucket="1 hour",
    )
