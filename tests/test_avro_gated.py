"""Jar-gated Avro interop lane: the Kafka ecosystem's wire format.

The reference's bus payloads are JSON, but any Kafka deployment one step
bigger uses Avro + schema registry, so the engine surface should prove the
round-trip the moment the module is present. ``spark-avro`` is an EXTERNAL
module (not in ``$SPARK_HOME/jars`` by default) and this sandbox has no
network to fetch it (see COVERAGE.md "Environment gates"), so the test
skips with a reason here and runs green anywhere the jar exists: drop
``spark-avro_*.jar`` into ``$SPARK_HOME/jars`` or point
``LAKEFLOW_AVRO_JAR`` at it.

Runs in a SUBPROCESS with its own SparkSession because ``spark.jars`` binds
at builder time — the shared session fixture cannot be retrofitted.
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

builder = (
    SparkSession.builder.master("local[4]")
    .appName("lakeflow-avro-roundtrip")
    .config("spark.sql.shuffle.partitions", "4")
)
jar = sys.argv[1] if len(sys.argv) > 1 else ""
if jar:
    builder = builder.config("spark.jars", jar)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

df = spark.createDataFrame(
    [(1, "alpha", 1.5), (2, "beta", None), (3, None, 2.25)],
    "id long, name string, score double",
)

# 1. File-format round-trip preserves rows, schema nullability, and NULLs.
d = tempfile.mkdtemp() + "/t"
df.write.format("avro").save(d)
back = spark.read.format("avro").load(d)
assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
assert dict(back.dtypes) == dict(df.dtypes), (back.dtypes, df.dtypes)

# 2. Record encode/decode (the Kafka value path): to_avro -> from_avro is
#    the identity on a struct payload.
from pyspark.sql import functions as F
from pyspark.sql.avro.functions import from_avro, to_avro

schema_json = (
    '{"type":"record","name":"r","fields":['
    '{"name":"id","type":"long"},'
    '{"name":"name","type":["null","string"]},'
    '{"name":"score","type":["null","double"]}]}'
)
enc = df.select(to_avro(F.struct("id", "name", "score")).alias("value"))
dec = enc.select(from_avro("value", schema_json).alias("r")).select(
    "r.id", "r.name", "r.score"
)
assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))

print("AVRO_OK")
spark.stop()
"""


def _find_avro_jar() -> str | None:
    explicit = os.environ.get("LAKEFLOW_AVRO_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    import pyspark

    jars_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    hits = glob.glob(os.path.join(jars_dir, "spark-avro_*.jar"))
    return hits[0] if hits else None


def test_avro_roundtrip_with_module():
    jar = _find_avro_jar()
    if jar is None:
        pytest.skip(
            "spark-avro module not on disk and no network to fetch it "
            "(COVERAGE.md 'Environment gates'); set LAKEFLOW_AVRO_JAR or "
            "drop spark-avro_*.jar into pyspark/jars to run"
        )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, jar],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "AVRO_OK" in proc.stdout


def test_avro_absence_fails_with_module_error(spark):
    """Pin the exact failure mode when the module is missing, so a future
    environment that silently half-loads avro is caught (same contract as
    test_kafka_json_stream_wiring)."""
    if _find_avro_jar() is not None:
        pytest.skip("avro module present; absence contract not applicable")
    with pytest.raises(Exception, match="avro|AVRO"):
        spark.range(1).write.format("avro").save("/tmp/never-lands")
