"""Custom Python data-source WRITER (PySpark 4 DataSource API): a
two-phase-commit JSONL shard sink.

``lakeflow/sources/pysource.py`` covers the reader half of the API (batch
partitions + stream offsets); this module completes the surface with
``DataSourceWriter``: executor tasks write shards under temporary names and
return a ``WriterCommitMessage`` naming them, and only the driver-side
``commit()`` publishes the shards (rename) plus a ``_MANIFEST`` listing —
the write-audit-publish contract, so a failed/speculative task can never
leave a half-visible shard. ``abort()`` removes the temporaries.

Scale notes: each task streams its partition through a single shard file —
no buffering of the partition in memory; shard names are
``part-{partitionId}-{taskAttemptId}.jsonl`` so retried attempts cannot
collide. The rename-based publish assumes a filesystem with atomic rename
(local/HDFS); an object-store deployment would skip the rename and make the
manifest the source of truth, which is exactly how the versioned-table layer
(`lakeflow/tables.py`) already publishes snapshots.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class JsonlCommit(WriterCommitMessage):
    """One committed shard: its temporary path and final name."""

    def __init__(self, tmp_path: str, final_name: str) -> None:
        self.tmp_path = tmp_path
        self.final_name = final_name


class JsonlShardWriter(DataSourceWriter):
    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator: Iterator) -> JsonlCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        final_name = f"part-{pid:05d}-{attempt}.jsonl"
        tmp_path = os.path.join(self.path, f".{final_name}.tmp")
        os.makedirs(self.path, exist_ok=True)
        with open(tmp_path, "w", encoding="utf-8") as f:
            for row in iterator:
                d = row.asDict()
                f.write(json.dumps(d, ensure_ascii=False, default=str))
                f.write("\n")
        return JsonlCommit(tmp_path, final_name)

    def commit(self, messages: list) -> None:
        published = []
        for m in messages:
            final = os.path.join(self.path, m.final_name)
            os.replace(m.tmp_path, final)
            published.append(m.final_name)
        manifest = os.path.join(self.path, "_MANIFEST")
        with open(manifest, "w", encoding="utf-8") as f:
            json.dump(sorted(published), f)

    def abort(self, messages: list) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except FileNotFoundError:
                pass


class JsonlSinkDataSource(DataSource):
    """``df.write.format("lakeflow_jsonl_sink").option("path", p).save()``."""

    @classmethod
    def name(cls) -> str:
        return "lakeflow_jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlShardWriter:
        path = self.options.get("path")
        if not path:
            raise ValueError("lakeflow_jsonl_sink requires option 'path'")
        return JsonlShardWriter(path)


def register_jsonl_sink(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
