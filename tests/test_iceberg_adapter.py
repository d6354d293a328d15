"""Jar-gated interop test against a REAL Iceberg runtime (VERDICT r5 "Next
round #4"): create → MERGE → time-travel → stream-read one table through
`iceberg-spark-runtime`, exercising the generated MERGE SQL
(lakeflow.formats) against the actual format instead of the DuckDB proxy.

The reference gets these capabilities from exactly this jar + extension
(/root/reference/docker/spark/conf/spark-defaults.conf:8-12). This sandbox
ships neither the jar nor network access (see COVERAGE.md "Environment
gates"), so the test skips with a reason here and runs green anywhere the
jar is present: drop `iceberg-spark-runtime-*.jar` into `$SPARK_HOME/jars`
(or point `LAKEFLOW_ICEBERG_JAR` at it) and re-run.

Runs in a SUBPROCESS with its own SparkSession because Iceberg's session
extension must be configured at builder time — the shared session fixture
cannot be retrofitted.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import sys, tempfile

from pyspark.sql import SparkSession

warehouse = tempfile.mkdtemp()
builder = (
    SparkSession.builder.master("local[4]")
    .appName("lakeflow-iceberg-adapter")
    .config(
        "spark.sql.extensions",
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    )
    .config("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.it.type", "hadoop")
    .config("spark.sql.catalog.it.warehouse", warehouse)
    .config("spark.sql.shuffle.partitions", "4")
)
jar = sys.argv[1] if len(sys.argv) > 1 else ""
if jar:
    builder = builder.config("spark.jars", jar)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from lakeflow.formats import detect_lakehouse_format, scd1_merge_sql

assert detect_lakehouse_format(spark) == "iceberg", "extension not loaded"

# create
spark.sql("CREATE TABLE it.db.cust (k BIGINT, v STRING) USING iceberg")
spark.sql("INSERT INTO it.db.cust VALUES (1, 'a'), (2, 'b')")
v1_rows = {(r.k, r.v) for r in spark.table("it.db.cust").collect()}
assert v1_rows == {(1, "a"), (2, "b")}, v1_rows
snap1 = spark.sql(
    "SELECT snapshot_id FROM it.db.cust.snapshots ORDER BY committed_at DESC"
).first()[0]

# MERGE through the generated SQL (the statement lakeflow.formats emits)
spark.createDataFrame(
    [(2, "B"), (3, "c")], "k bigint, v string"
).createOrReplaceTempView("src")
spark.sql(scd1_merge_sql("it.db.cust", "src", keys=["k"], cols=["k", "v"]))
merged = {(r.k, r.v) for r in spark.table("it.db.cust").collect()}
assert merged == {(1, "a"), (2, "B"), (3, "c")}, merged

# time travel back before the merge
tt = {
    (r.k, r.v)
    for r in spark.sql(
        f"SELECT * FROM it.db.cust VERSION AS OF {snap1}"
    ).collect()
}
assert tt == {(1, "a"), (2, "b")}, tt

# stream-read: appends surface through the incremental reader
q = (
    spark.readStream.format("iceberg")
    .load("it.db.cust")
    .writeStream.format("memory")
    .queryName("cust_stream")
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(120)
streamed = {(r.k, r.v) for r in spark.sql("SELECT * FROM cust_stream").collect()}
assert (3, "c") in streamed, streamed

print("ICEBERG-ADAPTER-OK")
spark.stop()
"""


def _find_iceberg_jar() -> str | None:
    explicit = os.environ.get("LAKEFLOW_ICEBERG_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    roots = [os.environ.get("SPARK_HOME", "")]
    try:
        import pyspark

        roots.append(os.path.dirname(pyspark.__file__))
    except ImportError:
        pass
    for root in filter(None, roots):
        hits = glob.glob(os.path.join(root, "jars", "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


def test_iceberg_roundtrip_merge_timetravel_stream():
    jar = _find_iceberg_jar()
    if jar is None:
        pytest.skip(
            "iceberg-spark-runtime jar not on classpath and not downloadable "
            "here (no network — COVERAGE.md 'Environment gates'); set "
            "LAKEFLOW_ICEBERG_JAR or drop the jar into $SPARK_HOME/jars"
        )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, jar],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ICEBERG-ADAPTER-OK" in proc.stdout
