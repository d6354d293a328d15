#!/usr/bin/env python
"""Jar-free Delta-protocol interop, end to end: build a versioned table
with history + policy, export it as a spec-conformant `_delta_log`, read
it back with the independent log-replay reader (time travel included),
STREAM it commit-by-commit, and import it into a fresh versioned table —
policy re-enforced.

    python examples/delta_interop.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.formats import export_delta, import_delta, read_delta_log
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session
from lakeflow.sources.delta_stream import register_delta_log_source
from lakeflow.streaming.sinks import run_to_memory
from lakeflow.tables import VersionedTable


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-delta", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("c_acctbal")
    )
    t = VersionedTable(spark, tempfile.mkdtemp(prefix="delta_src_"))
    t.commit(cust.filter("c_custkey <= 60"))
    t.add_constraint("key_pos", "c_custkey >= 0")
    t.commit(cust.filter("c_custkey > 60 AND c_custkey <= 100"), mode="append")
    print("source history:", [r.operation for r in t.snapshots().collect()])

    out = tempfile.mkdtemp(prefix="delta_log_")
    n = export_delta(t, out)
    print(f"exported {n} Delta commits to {out}/_delta_log")

    latest = read_delta_log(spark, out)
    v0 = read_delta_log(spark, out, version=0)
    print("replay reader: latest rows =", latest.count(), "| commit 0 rows =", v0.count())

    register_delta_log_source(spark)
    stream = spark.readStream.format("lakeflow_delta_log").option("path", out).load()
    name, _ = run_to_memory(stream)
    print("streamed rows:", spark.table(name).count())

    imp = import_delta(spark, out, tempfile.mkdtemp(prefix="delta_imp_"))
    print(
        "imported versions:", imp.versions(),
        "| constraints:", imp.constraints(),
    )
    assert imp.read().count() == t.read().count()
    spark.stop()


if __name__ == "__main__":
    main()
