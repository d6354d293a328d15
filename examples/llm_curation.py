#!/usr/bin/env python
"""LLM training-data curation pipeline over the documents corpus:

exact dedup -> segment-level boilerplate strip -> quality gate ->
leakage-safe train/val/test split -> token-budget sequence packing,
with per-stage attrition printed as a funnel.

    python examples/llm_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators import dedup as dd
from lakeflow.operators import text as tx
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-curation", master="local[8]", shuffle_partitions=8)
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 0. Gopher rule gate — scan-side, zero shuffles, so it runs FIRST:
    # every doc it drops never reaches the shuffle-bearing stages below
    # (thresholds scaled for the tiny synthetic docs).
    rules = tx.gopher_quality_flags(docs, min_words=25, min_stop_hits=0)
    docs = docs.join(
        rules.filter(F.col("passes_gopher")).select("doc_id"), "doc_id",
        "left_semi",
    )
    n0g = docs.count()

    # 1. exact dedup: keep one doc per normalized-content fingerprint
    keep = dd.exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
    docs1 = docs.join(keep, "doc_id", "left_semi")
    n1 = docs1.count()

    # 2. segment-level boilerplate strip (CCNet/RefinedWeb line dedup)
    stripped = tx.boilerplate_strip(docs1)
    docs2 = docs1.drop("text").join(
        stripped.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    ).filter(F.length("text") > 0)
    n2 = docs2.count()

    # 3. quality gate (length / alpha ratio / stopword heuristics) — the
    # verdict frame carries only (doc_id, reason, keep); semi-join it back.
    passing = tx.quality_filter(docs2).filter(F.col("keep")).select("doc_id")
    docs3 = docs2.join(passing, "doc_id", "left_semi")
    n3 = docs3.count()

    # 4. leakage-safe split: duplicate groups never straddle splits
    split = tx.leakage_safe_split(docs3)
    print("splits:", {r["split"]: r["n"] for r in
                      split.groupBy("split").agg(F.count("*").alias("n")).collect()})

    # 5. pack the train split into 512-token training bins
    train = docs3.join(
        split.filter(F.col("split") == "train").select("doc_id"), "doc_id", "left_semi"
    )
    bins = tx.pack_budget_bins(train, budget=512)
    print(
        f"funnel: raw={n0} gopher={n0g} deduped={n1} stripped={n2} "
        f"quality={n3}"
    )
    print(f"train bins: {bins.count()}, "
          f"avg tokens/bin: {bins.agg(F.avg('total_tokens')).first()[0]:.1f}")
    spark.stop()


if __name__ == "__main__":
    main()
