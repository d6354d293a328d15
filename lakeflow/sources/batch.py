"""Batch sources (SURVEY.md §2.1 S1, S4, S7).

* ``read_csv_raw`` — the reference's bronze CSV ingest: header, NO schema
  inference, every column a string (/root/reference/src/bronze/_bronze_utils.py:26-28).
  Inference is a full extra pass over the data — never at 100 TB.
* ``read_csv_typed`` — explicit-schema variant (the right way to type CSV).
* ``incremental_read`` — S4 high-watermark CDC scan: full load when the target
  is empty, else rows strictly newer than the target's max watermark column
  (/root/reference/src/silver/_silver_utils.py:35-49). The watermark becomes a
  literal predicate, so it pushes down to the scan and prunes partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv_raw(spark: SparkSession, path: str) -> DataFrame:
    """All-string CSV scan (bronze contract: types applied later by
    normalize_schema)."""
    return spark.read.csv(path, header=True, inferSchema=False)


def read_csv_typed(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Explicit-schema CSV scan — no inference pass."""
    return spark.read.csv(path, header=True, schema=schema)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def incremental_read(
    source: DataFrame,
    target: DataFrame | None,
    watermark_col: str,
) -> DataFrame:
    """High-watermark incremental scan.

    Full scan when ``target`` is None/empty; otherwise only rows with
    ``watermark_col`` strictly greater than the target's max. Two tiny driver
    jobs (emptiness probe + scalar max — parquet footer stats make the max
    near-free), then one filtered scan.
    """
    if target is None or target.isEmpty():
        return source
    hw = target.agg(F.max(watermark_col).alias("hw")).collect()[0]["hw"]
    if hw is None:
        return source
    return source.filter(F.col(watermark_col) > F.lit(hw))


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """JSON-lines source — the interchange format of LLM data pipelines.

    With an explicit schema the read is a single pass; without one Spark
    samples the file to infer (avoid at scale: it double-reads). Corrupt lines
    land in ``_corrupt_record`` instead of failing the job (PERMISSIVE), which
    is the right default for web-scraped corpora.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("mode", "PERMISSIVE").json(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """JSON-lines sink (one JSON object per line, UTF-8)."""
    df.write.mode(mode).json(path)
    return path


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Raw media ingestion via Spark's built-in ``binaryFile`` source:
    (path, modificationTime, length, content binary) — the real on-ramp for
    image/audio/video directories feeding lakeflow.operators.multimodal.
    Scale note: set ``spark.sql.files.maxPartitionBytes`` per media size and
    avoid tiny-file explosions by compacting upstream or reading archives.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
