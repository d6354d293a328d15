"""Watermarked streaming candle aggregation (SURVEY.md §2.8 T1-T7).

Streaming twin of lakeflow.operators.aggregates.tumbling_candles, with the
same deterministic event-time min_by/max_by semantics the batch path uses —
so a backfill (batch) and the live stream produce identical rows, the core
lakehouse correctness property. The reference's version
(/root/reference/src/silver/ohlcv_agg.py:17-38) relies on arrival order.

Scale notes: streaming state lives per (key, window); at high key cardinality
use the RocksDB state store provider and keep the watermark tight so state is
evicted promptly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeflow.functions.rounding import rnd


def streaming_candles(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    window_duration: str = "15 minutes",
    watermark: str = "1 minutes",
    round_to: int | None = 2,
) -> DataFrame:
    """Watermarked tumbling OHLCV candles over an unbounded DataFrame.

    Append-mode semantics: a window's row is emitted once, when the watermark
    (max event time − delay) passes the window end. Late rows beyond the
    watermark are dropped (T1).
    """
    w = F.window(F.col(ts_col), window_duration)

    def r(c: Column) -> Column:
        return rnd(c, round_to) if round_to is not None else c

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*key_cols, w.alias("__w"))
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
