#!/usr/bin/env python
"""Profile individual queries in isolation: noop-sink timing, N repeats.

Usage: python scripts/q_profile.py q1,q2,... [--reps N] [--sf DIR]

Replays the bench methodology (same session confs, same noop sink, same
warmups) on a chosen subset so a single query's cost can be measured
without the 55-query sweep — the guide §1 "isolate each expensive query"
step. Prints per-rep times; min-of-reps is the comparable number (the
bench's own min-of-2 warm-pass rationale).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    if "--sf" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf") + 1]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from lakeflow.queries import QUERIES
    from lakeflow.scratch import use_process_scratch
    from lakeflow.session import get_session

    use_process_scratch()
    spark = get_session(
        "lakeflow-q-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    from lakeflow.catalog import load_table

    for t in ("lineitem", "events", "documents"):
        try:
            load_table(spark, sf_dir, t).groupBy().count().collect()
        except Exception:
            pass

    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        for r in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # one broken query must not sink the run
                print(f"  {name} rep{r}: FAILED {exc!r}"[:300], file=sys.stderr)
                break
            dt = round(time.perf_counter() - t0, 3)
            times.append(dt)
            print(f"  {name} rep{r}: {dt:.3f}s", file=sys.stderr)
        if times:
            out[name] = times
    print(json.dumps({q: {"reps": ts, "min": min(ts)} for q, ts in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
