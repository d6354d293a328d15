"""Continuous aggregate: a streaming rollup table maintained incrementally.

The hypertable-rollup pattern (TimescaleDB continuous aggregates, Iceberg
streaming MERGE targets): the live stream's windowed candles are upserted into
a :class:`lakeflow.tables.VersionedTable` keyed by (key, bucket) as each
micro-batch's watermark closes windows. Readers always see a complete,
queryable rollup table; a batch backfill over historical data lands in the
same table through the same upsert, because the batch and streaming candle
operators share deterministic event-time semantics (lakeflow.streaming.candles
module doc).

Scale notes: each micro-batch touches only the windows the watermark just
closed, so the merge's source side is tiny regardless of table size; partition
the rollup table by coarse time (e.g. day) so the SCD1 rewrite touches one
partition. ``VersionedTable.compact()`` folds the per-batch commits back into
one dir on whatever cadence suits the query side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from lakeflow.streaming.candles import streaming_candles
from lakeflow.streaming.sinks import stream_upsert
from lakeflow.tables import VersionedTable


def continuous_candle_rollup(
    stream: DataFrame,
    table: VersionedTable,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
    window_duration: str = "15 minutes",
    watermark: str = "1 minutes",
    checkpoint: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``table`` as the always-current candle rollup of ``stream``."""
    candles = streaming_candles(
        stream,
        ts_col=ts_col,
        key_cols=key_cols,
        value_col=value_col,
        window_duration=window_duration,
        watermark=watermark,
    )
    return stream_upsert(
        candles,
        table,
        keys=[*key_cols, "bucket_start"],
        checkpoint=checkpoint,
        available_now=available_now,
    )
