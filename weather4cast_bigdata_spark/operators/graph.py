"""Graph analytics over edge-list DataFrames.

Connected components (the dedup canonicalizer) lives in
``operators.dedup``; this module adds PageRank — the standard
importance measure for link/citation/interaction graphs, and the
second iterative-computation pattern in the engine (CC's
min-propagation converges by halving distances; PageRank is a fixed
damping-factor power iteration).

Not in the reference (raster pipeline); added as a first-class
extension. Scale shape per round: ONE join of the rank vector with
the out-degree-annotated edge list (shuffle on src) + ONE groupBy-sum
on dst — both int-keyed — plus a scalar dangling-mass aggregate
(one double to the driver; the only driver traffic). The edge list
and node set persist once; ranks are ``localCheckpoint``-ed per round
so lineage stays O(1) over iterations, exactly as in
``dedup.connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Returns ``(id, rank)`` with ranks rounded to 6 decimals (ranks
    are order-dependent float sums; rounding makes output stable
    across partitionings per the engine numeric policy). Dangling
    nodes (no out-edges) redistribute their mass uniformly each
    round — without this the total rank leaks and the scores of a
    web-crawl-shaped graph (many sink pages) are meaningless.
    Parallel edges are collapsed; self-loops participate normally.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    ).distinct()
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    links = e.join(out_deg, on="src").persist()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("rank"))

    ranks = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    has_out = out_deg.select(F.col("src").alias("id"))
    for _ in range(iters):
        contrib = (
            links.join(ranks, links["src"] == ranks["id"])
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        # dangling mass: one scalar to the driver per round
        dangling = (
            ranks.join(has_out, on="id", how="left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contrib, on="id", how="left")
            .select(
                "id",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        ).localCheckpoint(eager=True)
    return ranks.select("id", F.round(F.col("rank") + F.lit(1e-9), 6).alias("rank"))
