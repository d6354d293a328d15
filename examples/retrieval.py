#!/usr/bin/env python
"""RAG retrieval stack over the documents + embeddings corpus:

BM25 keyword branch -> exact-cosine embedding branch -> reciprocal-rank
fusion, with the ANN variants (LSH-bucketed, IVF, PQ-ADC) shown as the
scale paths for the embedding branch.

    python examples/retrieval.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from pyspark.sql import functions as F

from lakeflow.catalog import load_table
from lakeflow.operators import similarity as sim
from lakeflow.operators import text as tx
from lakeflow.scratch import use_process_scratch
from lakeflow.session import get_session


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-retrieval", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    terms = ["spark", "window", "join"]

    print("== BM25 keyword branch (posting-list probe + TakeOrdered) ==")
    tx.bm25_topk(docs, terms, k=5).show(truncate=False)

    print("== Exact cosine branch (broadcast queries, corpus never shuffles) ==")
    q = emb.filter(F.col("vec_id") == 0)
    sim.brute_force_topk(emb, q, k=5).show(truncate=False)

    print("== Hybrid: reciprocal-rank fusion of both branches ==")
    sim.hybrid_rrf_topk(docs, emb, terms, query_vec_id=0, k=5).show(truncate=False)

    print("== Scale paths for the embedding branch ==")
    print("-- LSH-bucketed (sign projections; probe same-bucket only)")
    sim.lsh_bucketed_topk(emb, q, k=3, dim=64, planes=8).show(truncate=False)
    print("-- IVF (centroid cells; probe nearest cells only)")
    centroids = emb.filter(F.col("vec_id") < 16)
    sim.ivf_topk(emb, q, centroids=centroids, k=3).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
