"""Custom Python data source (PySpark 4 DataSource API): deterministic tick
replay.

The reference drives its streaming path with an out-of-band Kafka producer
replaying a CSV at ~30 msg/s (/root/reference/src/producer/ohlcv_producer.py:
42-61). This module is that producer re-expressed as a first-class Spark
source: ``spark.read.format("lakeflow_ticks")`` (partitioned, parallel batch
scan) and ``spark.readStream.format("lakeflow_ticks")`` (incremental offset
tracking) produce the SAME deterministic rows with no broker, no jars, and no
files — the generator is pure integer arithmetic, so any engine (including
the DuckDB oracle) can reproduce it exactly.

Row model (seq = 0..n-1):
    symbol = "SYM" + str(seq % n_symbols)
    ts     = base_ts + seq minutes
    price  = 100.0 + ((seq * 37) % 100) / 10.0
    volume = (seq * 13) % 1000

Scale notes: the batch reader splits the seq range round-robin across
``partitions`` input splits, so generation parallelizes like any scan; the
stream reader advances a single integer offset per micro-batch — state is
O(1) and replay from any checkpoint is exact (same arithmetic, same rows).
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_BASE = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _row(seq: int, n_symbols: int) -> tuple:
    return (
        f"SYM{seq % n_symbols}",
        seq,
        _BASE + _dt.timedelta(minutes=seq),
        100.0 + ((seq * 37) % 100) / 10.0,
        (seq * 13) % 1000,
    )


class TickDataSource(DataSource):
    """``format("lakeflow_ticks")``; options: n, partitions, n_symbols, batch."""

    @classmethod
    def name(cls) -> str:
        return "lakeflow_ticks"

    def schema(self) -> str:
        return "symbol string, seq bigint, ts timestamp, price double, volume bigint"

    def reader(self, schema) -> "TickBatchReader":
        return TickBatchReader(
            n=int(self.options.get("n", "6000")),
            partitions=int(self.options.get("partitions", "8")),
            n_symbols=int(self.options.get("n_symbols", "7")),
        )

    def simpleStreamReader(self, schema) -> "TickStreamReader":
        return TickStreamReader(
            n=int(self.options.get("n", "6000")),
            batch=int(self.options.get("batch", "1000")),
            n_symbols=int(self.options.get("n_symbols", "7")),
        )


class TickBatchReader(DataSourceReader):
    def __init__(self, n: int, partitions: int, n_symbols: int) -> None:
        self.n, self.parts, self.n_symbols = n, partitions, n_symbols

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        for seq in range(partition.value, self.n, self.parts):
            yield _row(seq, self.n_symbols)


class TickStreamReader(SimpleDataSourceStreamReader):
    """Offset = how many ticks have been emitted; each micro-batch replays the
    next ``batch`` of them. readBetweenOffsets regenerates deterministically,
    so failure replay is exact (effectively-once with an idempotent sink)."""

    def __init__(self, n: int, batch: int, n_symbols: int) -> None:
        self.n, self.batch, self.n_symbols = n, batch, n_symbols

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        pos = int(start["pos"])
        end = min(pos + self.batch, self.n)
        return self.readBetweenOffsets(start, {"pos": end}), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # A list-backed iterator: the engine pickles prefetched batches for
        # replay, and generator objects cannot be pickled.
        return iter(
            [
                _row(seq, self.n_symbols)
                for seq in range(int(start["pos"]), int(end["pos"]))
            ]
        )


def register_tick_source(spark: SparkSession) -> None:
    """Idempotent registration of the custom source with this session."""
    spark.dataSource.register(TickDataSource)
