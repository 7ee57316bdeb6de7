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
on dst — both int-keyed — plus a 1-row dangling-mass aggregate
broadcast into the update in-plan (no driver collect). The edge list
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
        # Dangling mass folded IN-PLAN: a 1-row aggregate broadcast
        # into the rank update via crossJoin (the same scalar-
        # normalizer shape flagship_evaluate uses) — no per-iteration
        # driver collect, so the only driver action per round is the
        # lineage-truncating eager checkpoint below. Term grouping
        # mirrors the scalar form ((1-d)/n + d·dm/n) + d·c so ranks
        # stay bit-identical to the collected version.
        dangling = ranks.join(has_out, on="id", how="left_anti").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            nodes.join(contrib, on="id", how="left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dm") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("rank"),
            )
        ).localCheckpoint(eager=True)
    return ranks.select("id", F.round(F.col("rank") + F.lit(1e-9), 6).alias("rank"))


def triangle_stats(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Global triangle census over an undirected edge list (canonical
    ``a < b`` per edge): edge count, wedge count (paths of length 2),
    triangle count, and the global clustering coefficient
    ``3·triangles / wedges`` — the density fingerprint of a near-dup
    graph (clone clusters are cliques, so a high coefficient means
    dup mass concentrates in tight groups rather than long chains).

    Enumeration is DEGREE-ORIENTED, the standard skew defense for
    distributed triangle counting (MR-era "count triangles" /
    Schank-Wagner): each undirected edge is directed from its
    lower-(degree, id) endpoint to the higher one, wedges are
    enumerated only at their smallest-degree apex, and each triangle
    is produced exactly once. A raw a<b self-join pivots every wedge
    on whatever node happens to have the small id — a power-law hub
    (one boilerplate doc near-duping thousands) then lands its full
    O(deg²) wedge set in one task; orientation bounds every apex's
    out-degree by O(√m), so the worst task is O(m) wedges no matter
    how skewed the degree distribution. Three int-keyed shuffles
    (degrees, wedge join, closing-edge join).
    """
    e = edges.select(F.col(a).alias("u"), F.col(b).alias("v")).distinct()
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    n_edges = e.count()
    wedges_undirected = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("n_wedges")
    )
    # orient: src = smaller (deg, id); dst = larger
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("dv"))
    ann = e.join(du, "u").join(dv, "v")
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ann.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("dst"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    # wedges at the apex: src -> {dst1, dst2}, dst1 < dst2 dedup
    wedge = o1.join(o2, F.col("o1.src") == F.col("o2.src")).where(
        F.col("o1.dst") < F.col("o2.dst")
    ).select(F.col("o1.dst").alias("x"), F.col("o2.dst").alias("y"))
    # close the wedge with the undirected canonical edge: x<y always
    # holds, and e is canonical u<v, so one equi-join direction
    # suffices (an inner join is safe — e is distinct, so at most one
    # match per wedge)
    tri = wedge.join(
        e, (F.col("x") == F.col("u")) & (F.col("y") == F.col("v")), "left_semi"
    ).count()
    spark = edges.sparkSession
    return (
        spark.createDataFrame([(n_edges, tri)], "n_edges bigint, n_triangles bigint")
        .crossJoin(wedges_undirected)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(F.col("n_wedges") > 0, 3.0 * F.col("n_triangles") / F.col("n_wedges"))
                .otherwise(F.lit(0.0))
                + F.lit(1e-9),
                6,
            ).alias("clustering_coeff"),
        )
    )
