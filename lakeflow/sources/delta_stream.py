"""Streaming reads of a Delta transaction log — the jar-free twin of
``spark.readStream.format("delta")`` (reference S3's real lakehouse form):
``spark.readStream.format("lakeflow_delta_log").option("path", root)`` emits
each commit's ADDED files as a micro-batch.

Works against any writer's ``_delta_log`` (the public delta.io PROTOCOL.md
is the only contract used): the stream offset is the commit index, the
DRIVER parses only the commit JSONs (no data IO, no filesystem listing),
and each added data file becomes one input split whose parquet an EXECUTOR
reads with pyarrow — partition columns recovered from the recorded
``partitionValues`` exactly like the batch reader
(:func:`lakeflow.formats.read_delta_log`). ``remove`` actions follow
Delta's own streaming contract: fail the stream by default, or drop the
whole change commit with ``.option("on_change", "skip")``
(``skipChangeCommits``).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from lakeflow.formats import DELTA_LOG_DIR


def _commit_files(root: str) -> list[tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(root, DELTA_LOG_DIR, "*.json")):
        out.append((int(os.path.basename(p).split(".")[0]), p))
    return sorted(out)


def _parse_commit(path: str) -> list[dict]:
    with open(path) as fh:
        return [json.loads(line) for line in fh if line.strip()]


class DeltaLogDataSource(DataSource):
    """``format("lakeflow_delta_log")``; options: path, on_change
    (fail|skip), start_commit (exclusive, default -1 = from genesis)."""

    @classmethod
    def name(cls) -> str:
        return "lakeflow_delta_log"

    def _latest_meta(self) -> dict:
        meta = None
        for _i, p in _commit_files(self.options["path"]):
            for a in _parse_commit(p):
                if "metaData" in a:
                    meta = a["metaData"]
        if meta is None:
            raise ValueError(
                f"no metaData action in {self.options['path']}/_delta_log"
            )
        return meta

    def schema(self):
        from pyspark.sql.types import StructType

        return StructType.fromJson(
            json.loads(self._latest_meta()["schemaString"])
        )

    def streamReader(self, schema) -> "DeltaLogStreamReader":
        meta = self._latest_meta()
        return DeltaLogStreamReader(
            root=self.options["path"],
            on_change=self.options.get("on_change", "fail"),
            start_commit=int(self.options.get("start_commit", "-1")),
            schema_json=meta["schemaString"],
            part_cols=meta["partitionColumns"],
        )


class _AddFilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        part_values: dict,
        schema_json: str,
        part_cols: list[str],
    ) -> None:
        self.path = path
        self.part_values = part_values
        self.schema_json = schema_json
        self.part_cols = part_cols


class DeltaLogStreamReader(DataSourceStreamReader):
    """Offset = last commit index fully emitted. Commit JSONs are immutable
    once written, so planning a batch twice yields identical splits and
    checkpoint-recovery replay is exact."""

    def __init__(
        self,
        root: str,
        on_change: str,
        start_commit: int,
        schema_json: str,
        part_cols: list[str],
    ) -> None:
        if on_change not in ("fail", "skip"):
            raise ValueError(f"on_change must be fail|skip, got {on_change!r}")
        self.root = root
        self.on_change = on_change
        self.start_commit = start_commit
        self.schema_json = schema_json
        self.part_cols = part_cols

    def initialOffset(self) -> dict:
        return {"commit": self.start_commit}

    def latestOffset(self) -> dict:
        cs = _commit_files(self.root)
        return {
            "commit": max(cs[-1][0], self.start_commit)
            if cs
            else self.start_commit
        }

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["commit"]), int(end["commit"])
        parts = []
        for i, p in _commit_files(self.root):
            if not (lo < i <= hi):
                continue
            actions = _parse_commit(p)
            adds = [a["add"] for a in actions if "add" in a]
            removes = [a for a in actions if "remove" in a]
            if removes:
                if self.on_change == "fail":
                    raise RuntimeError(
                        f"commit {i} of {self.root} removes files (a "
                        "rewrite/compaction); stream appends only, or set "
                        "on_change=skip to drop change commits "
                        "(skipChangeCommits)"
                    )
                continue  # skip the whole change commit, Delta's contract
            parts.extend(
                _AddFilePartition(
                    os.path.join(self.root, a["path"]),
                    a.get("partitionValues", {}),
                    self.schema_json,
                    self.part_cols,
                )
                for a in adds
            )
        return parts

    def read(self, partition):
        # Executor-side: pyarrow read of ONE data file; partition columns
        # come from the log's partitionValues, cast per the schema.
        import pyarrow.parquet as pq
        from pyspark.sql.types import StructType

        st = StructType.fromJson(json.loads(partition.schema_json))
        table = pq.read_table(partition.path)

        def pval(field):
            raw = partition.part_values.get(field.name)
            if raw is None:
                return None
            t = field.dataType.simpleString()
            if t in ("tinyint", "smallint", "int", "bigint"):
                return int(raw)
            if t in ("float", "double"):
                return float(raw)
            return raw

        cols = []
        for f in st.fields:
            if f.name in partition.part_cols:
                cols.append([pval(f)] * table.num_rows)
            elif f.name in table.column_names:
                cols.append(table.column(f.name).to_pylist())
            else:  # schema evolution: pre-column files read NULL
                cols.append([None] * table.num_rows)
        return iter(zip(*cols))

    def commit(self, end: dict) -> None:
        pass  # offsets live in the engine checkpoint; commit JSONs are immutable


def register_delta_log_source(spark: SparkSession) -> None:
    """Idempotent registration of the Delta-log stream source."""
    spark.dataSource.register(DeltaLogDataSource)
