"""Link-analysis operators (north star): PageRank-style centrality as a
quality prior — the Common-Crawl-lineage signal (harmonic/PageRank
centrality over the link graph) web-corpus curation pipelines rank and
sample by.

Spark-first shape: one equi-join + aggregate per iteration (the classic
distributed PageRank), iterations UNROLLED into a static plan — no driver
loop over collected data, shuffle per iteration bounded by the edge list.
At 100 TB: pre-partition edges by ``src`` and persist ranks between
iterations so the join co-locates; AQE handles in-degree skew (a hub page's
contributions arrive as combine-bounded partial sums, never a row pileup).

All arithmetic is INTEGER micro-units with explicit floor divisions, so an
iteration is bit-reproducible on any engine — the registered query's DuckDB
oracle replays every iteration exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    iters: int = 3,
    damping_pct: int = 85,
    rank_scale: int = 1_000_000,
) -> DataFrame:
    """Simplified PageRank (no dangling-mass redistribution — dangling
    nodes' rank leaks, the common large-scale simplification) over
    ``iters`` unrolled iterations.

    Per node: ``r_0 = rank_scale // N``; per iteration
    ``r_{t+1} = (rank_scale·(100−d)) // (100·N)
    + (d · Σ_in (r_t // outdeg)) // 100`` — every division an integer
    floor, so results are exact and engine-replayable. Multi-edges
    contribute once per edge (no dedup), matching how a repeated hyperlink
    counts twice.

    ``nodes`` fixes the ranked universe (isolated nodes keep the base
    rank); N is its count. Output: (id, rank_micro).
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError(f"damping_pct must be 0..100, got {damping_pct}")
    n = nodes.count()
    if n == 0:
        raise ValueError("empty node set")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    )
    outdeg = e.groupBy("__src").agg(
        F.count(F.lit(1)).cast("bigint").alias("__od")
    )
    e = e.join(outdeg, "__src")
    ids = nodes.select(F.col(id_col).alias("id"))
    base = (rank_scale * (100 - damping_pct)) // (100 * n)
    ranks = ids.withColumn(
        "rank_micro", F.lit(rank_scale // n).cast("bigint")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks, e["__src"] == ranks["id"])
            .select(
                F.col("__dst").alias("id"),
                F.expr("rank_micro div __od").alias("__c"),
            )
            .groupBy("id")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = ids.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(base).cast("bigint")
                + F.expr(
                    f"({damping_pct} * coalesce(__s, 0L)) div 100"
                )
            ).cast("bigint").alias("rank_micro"),
        )
    return ranks
