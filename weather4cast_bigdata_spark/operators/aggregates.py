"""Aggregation operators: loss family, Gram/correlation statistics.

The reference's ensemble fit is an incremental Gram-matrix
aggregation (``ensemble.py:18-41``) — exactly Spark's partial+final
hash aggregation. All of these are single-shuffle groupBy aggs with
map-side combine; the k(k+1)/2 product expressions are generated
programmatically (SURVEY.md §4 item 3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions.scalar import normlogit


def mse(pred: Column, truth: Column) -> Column:
    """Mean squared error. Reference: models.py:316 ('mse' loss)."""
    return F.avg(F.pow(pred - truth, 2))


def rounded_mse(pred: Column, truth: Column) -> Column:
    """MSE after rounding the prediction (binary ``cma`` loss).

    Reference: models.py:282-287,322-324.
    """
    return F.avg(F.pow(F.round(pred) - truth, 2))


def normlogit_mse(pred: Column, truth: Column) -> Column:
    """MSE in normlogit space (``asii_turb_trop_prob`` loss).

    Reference: models.py:293-301,313-316.
    """
    return F.avg(F.pow(normlogit(pred) - normlogit(truth), 2))


def bool_any(cond: Column) -> Column:
    """``tf.reduce_any`` analog. Reference: models.py:268-270."""
    return F.bool_or(cond)


def mean_nonfill(value: Column, is_fill: Column) -> Column:
    """Mean over non-fill pixels. Reference: datasets.py:67."""
    return F.avg(F.when(~is_fill, value))


def gram_matrix_exprs(
    pred_cols: Sequence[str], truth_col: str | None = None
) -> list[Column]:
    """Normal-equation statistics for the ridge ensemble fit:
    ``ata_i_j = Σ pᵢ·pⱼ / N`` for i ≤ j, and ``aty_i = Σ pᵢ·y / N``.

    Reference: ensemble.py:18-41 (ATA/ATy running means). k ≤ 5 in the
    reference ⇒ ≤ 15+5 expressions; generated for arbitrary k.
    """
    exprs: list[Column] = []
    n = F.count(F.lit(1)).cast("double")
    for i, ci in enumerate(pred_cols):
        for j, cj in enumerate(pred_cols):
            if j < i:
                continue
            exprs.append((F.sum(F.col(ci) * F.col(cj)) / n).alias(f"ata_{i}_{j}"))
    if truth_col is not None:
        for i, ci in enumerate(pred_cols):
            exprs.append((F.sum(F.col(ci) * F.col(truth_col)) / n).alias(f"aty_{i}"))
    return exprs


def gram_matrix(df: DataFrame, pred_cols: Sequence[str], truth_col: str | None = None) -> DataFrame:
    """One-row DataFrame holding the full upper-triangle Gram stats."""
    return df.groupBy().agg(*gram_matrix_exprs(pred_cols, truth_col))


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations across model outputs (+ truth).

    Reference: ensemble.py:103-123 (E[x], E[xxᵀ] → cov → corr).
    """
    exprs = [
        F.corr(F.col(a), F.col(b)).alias(f"corr_{i}_{j}")
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if i < j
    ]
    return df.groupBy().agg(*exprs)


def weighted_multiloss(
    per_group_loss: DataFrame,
    group_col: str,
    loss_col: str,
    weights: DataFrame,
    weight_col: str = "weight",
) -> DataFrame:
    """Total loss = Σ w_g · loss_g / n_groups, weights from a small
    broadcast dim table. Reference: models.py:304-318 (inverse-variance
    weights over per-variable losses).
    """
    joined = per_group_loss.join(F.broadcast(weights), on=group_col, how="inner")
    n = F.count(F.lit(1)).cast("double")
    return joined.groupBy().agg(
        (F.sum(F.col(loss_col) * F.col(weight_col)) / n).alias("total_loss")
    )


def top_frequent(df: DataFrame, col: str, k: int = 100) -> DataFrame:
    """Heavy hitters: the k most frequent values of ``col`` with
    deterministic (freq desc, value asc) tie-breaking.

    groupBy partial-aggregates map-side, then ``orderBy + limit``
    plans as TakeOrderedAndProject — each partition keeps only its
    local top-k before the single-reducer merge, so driver/exchange
    volume is O(k · partitions), never the full distinct-value count.
    The building block for vocabulary construction and frequency
    stop-lists over a 100 TB corpus.
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("freq"))
    return counts.orderBy(F.col("freq").desc(), F.col(col)).limit(k)


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized mean: clip values to the group's
    [lo, hi] exact interpolated percentiles, then average — the
    outlier-robust statistic quality dashboards report over skewed
    value distributions.

    Two aggregations over one scan: the percentile bounds (one
    sort-based agg per group — group cardinality is small, the
    result is a dim table) broadcast back onto the fact rows, then a
    hash-agg mean of the clipped value. At 100 TB swap
    ``percentile`` for ``approx_percentile`` (sketch-mergeable, no
    per-group sort) — same plan shape, documented trade-off.
    """
    # NULL values must be excluded BEFORE clipping: least/greatest
    # skip nulls in both engines, so an unfiltered NULL would clip to
    # the lower bound instead of dropping out of the mean.
    df = df.where(F.col(value_col).isNotNull())
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo)).alias("_lo"),
        F.percentile(value_col, F.lit(hi)).alias("_hi"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return (
        df.join(F.broadcast(bounds), on=group_col)
        .groupBy(group_col)
        .agg(
            F.round(F.avg(clipped) + F.lit(1e-9), 6).alias("winsor_mean"),
            F.round(F.min("_lo") + F.lit(1e-9), 6).alias("p_lo"),
            F.round(F.min("_hi") + F.lit(1e-9), 6).alias("p_hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def count_min_estimates(
    items: DataFrame,
    item_col: str = "item",
    width: int = 1024,
    depth: int = 3,
) -> DataFrame:
    """Count–Min sketch frequency estimates: per item occurrence,
    ``depth`` independent hash rows (disjoint 32-bit slices of the
    item's md5 digest) each pick a counter ``h_j % width``; an
    item's estimate is the MIN of its ``depth`` counters.

    Why this is the 100 TB shape: the sketch state is a fixed
    ``depth × width`` counter table (3 × 1024 here) no matter how
    large the corpus — the groupBy that builds it shuffles at most
    ``depth·width`` rows after map-side combine, vs. a full
    per-item groupBy whose key cardinality grows with the data.
    Estimates are one-sided (estimate ≥ true count, overestimate
    bounded by ε·N with ε = e/width at the usual depth ln(1/δ)) —
    the right direction for heavy-hitter screening: no heavy item
    is ever missed.

    md5-slice hashing is engine-portable, so a SQL oracle rebuilds
    the identical sketch, collisions included.

    Returns (item, est) for every distinct item; join back to true
    counts to expose the overestimate.

    Execution shape: ONE corpus pass builds the counter table
    (map-side combine shuffles ≤ depth·width partial rows), then the
    fitted table — ``depth × width`` longs, fixed size by
    construction, a bounded driver contract like the PQ codebook
    (similarity.py) — is constant-folded into the per-item estimate
    projection as literal arrays. The estimate side therefore costs
    a distinct on the items (the output key set) plus a narrow
    projection: no second corpus tokenization, no probe explode, no
    counter join.
    """
    table = count_min_table(items, item_col, width, depth)
    return (
        items.select(item_col)
        .distinct()
        .select(
            F.col(item_col),
            count_min_expr(table, item_col, width).alias("est"),
        )
    )


def _cms_bucket_sql(item_col: str, j: int, width: int) -> str:
    return (
        f"cast(conv(substring(md5(cast(`{item_col}` as string)), "
        f"{1 + 8 * j}, 8), 16, 10) as bigint) % {width}"
    )


def count_min_table(
    items: DataFrame,
    item_col: str = "item",
    width: int = 1024,
    depth: int = 3,
) -> list[list[int]]:
    """Fit the Count–Min counter table in ONE corpus pass: the
    groupBy shuffles ≤ depth·width partial rows after map-side
    combine, and the collect is bounded by depth·width BY
    CONSTRUCTION (3·1024 default) at any corpus size — the same
    bounded-driver contract as the PQ codebook (similarity.py).
    Absent buckets stay 0: an item hashing into a never-hit counter
    still gets a one-sided (>= true) estimate. NULL items are not
    counted (md5(NULL) has no bucket), matching the join-based
    predecessor's drop-NULL behavior."""
    depth_arr = ", ".join(
        _cms_bucket_sql(item_col, j, width) for j in range(depth)
    )
    counters = (
        items.where(F.col(item_col).isNotNull())
        .select(F.posexplode(F.expr(f"array({depth_arr})")).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    table = [[0] * width for _ in range(depth)]
    for r in counters.collect():
        table[r["j"]][r["bucket"]] = r["c"]
    return table


def count_min_expr(
    table: list[list[int]], item_col: str, width: int = 1024
):
    """The fitted sketch as a pure projection: estimate =
    least(counter_j[bucket_j(item)]) with the counters constant-
    folded as literal arrays, emitted as ONE SQL string (a single
    JVM parse — per-literal Column construction would cost a py4j
    round trip each). Applying this to any frame carrying
    ``item_col`` costs zero joins and zero extra corpus passes.
    bigint cast: small literal counters parse as INT, but the
    counter domain (and the dtype-strict oracle) is 64-bit."""
    probes = ", ".join(
        f"element_at(array({', '.join(str(c) for c in row)}), "
        f"cast(({_cms_bucket_sql(item_col, j, width)}) as int) + 1)"
        for j, row in enumerate(table)
    )
    return F.expr(f"cast(least({probes}) as bigint)")


def exact_group_percentiles(
    df: DataFrame,
    group_col: str,
    val_col: str,
    ps: Sequence[float],
    n_buckets: int = 1024,
) -> DataFrame:
    """EXACT interpolated per-group percentiles via histogram-refine
    (distributed selection), the scale path the sort-buffer
    ``percentile()`` aggregate cannot take.

    ``percentile()`` is an ObjectAggregate: every partial buffer
    holds its partition's raw values and is SERIALIZED into the
    shuffle, and the final merge runs ONE task per group — at 100 TB
    with a handful of groups that is a handful of tasks each sorting
    a terabyte. Here the full data is never shuffled at all:

    1. one narrow pass → per-(group, value-bucket) counts (map-side
       combined; the exchange carries ≤ groups × n_buckets rows);
    2. tiny-frame math (cumulative bucket starts per group, target
       ranks pos = (n-1)·p per percentile) locates, for every needed
       rank, the ONE bucket containing it;
    3. a second narrow pass extracts only the needed buckets'
       rows (≈ n/n_buckets each) and ranks them with a per-bucket
       window — parallelism = number of needed buckets, independent
       of group cardinality;
    4. value at rank, then the SAME two-sided linear interpolation
       Spark's ``percentile()`` applies — ``lo·(⌈pos⌉−pos) +
       hi·(pos−⌊pos⌋)``, integral pos returning the value directly —
       so the result is bit-identical to the aggregate (parity
       test), and matches DuckDB's ``quantile_cont`` under the
       repo's round(·+1e-9, 6) policy.

    Bounded driver contract: one 2-value min/max collect. Caveat
    (same spirit as pack_chunked's id-range note): buckets follow the
    VALUE range, so a pathologically concentrated distribution puts
    a needed rank in a heavy bucket and step 3's window task grows —
    recurse with a second histogram level (or raise ``n_buckets``)
    for adversarial data; NULL values are excluded, matching the
    aggregate's semantics."""
    from pyspark.sql import Window

    g = group_col
    d = df.select(
        F.col(g), F.col(val_col).cast("double").alias("_v")
    ).where(F.col("_v").isNotNull())
    row = d.agg(F.min("_v").alias("lo"), F.max("_v").alias("hi")).collect()
    if not row or row[0]["lo"] is None:
        return (
            d.select(g)
            .limit(0)
            .withColumn("p", F.lit(0.0))
            .withColumn("value", F.lit(0.0))
        )
    lo, hi = float(row[0]["lo"]), float(row[0]["hi"])
    span = (hi - lo) / n_buckets or 1.0
    d = d.withColumn(
        "_b",
        F.least(
            F.floor((F.col("_v") - F.lit(lo)) / F.lit(span)),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )
    hist = d.groupBy(g, "_b").agg(F.count(F.lit(1)).alias("_c"))
    prior = (
        Window.partitionBy(g)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    starts = hist.withColumn(
        "_start", F.coalesce(F.sum("_c").over(prior), F.lit(0))
    )
    totals = hist.groupBy(g).agg(F.sum("_c").alias("_n"))
    ps_lit = F.array(*[F.lit(float(p)) for p in ps])
    targets = (
        totals.select(F.col(g), F.explode(ps_lit).alias("p"), F.col("_n"))
        .withColumn("_pos", (F.col("_n") - 1) * F.col("p"))
        .withColumn("_lo_r", F.floor("_pos").cast("bigint"))
        .withColumn("_hi_r", F.ceil("_pos").cast("bigint"))
    )
    need = targets.select(
        F.col(g),
        "p",
        "_pos",
        F.explode(F.array_distinct(F.array("_lo_r", "_hi_r"))).alias("_rank"),
    )
    # locate each needed rank's bucket — both frames are tiny
    # (groups × ps × 2 vs groups × n_buckets); broadcast range join
    needb = need.join(
        F.broadcast(starts),
        (need[g] == starts[g])
        & (F.col("_rank") >= F.col("_start"))
        & (F.col("_rank") < F.col("_start") + F.col("_c")),
    ).select(need[g], "p", "_pos", "_rank", "_b", "_start")
    hot = needb.select(g, "_b").distinct()
    sel = d.join(F.broadcast(hot), on=[g, "_b"])
    w = Window.partitionBy(g, "_b").orderBy("_v")
    ranked = sel.withColumn("_lr", F.row_number().over(w) - 1)
    vals = ranked.join(
        F.broadcast(needb.withColumnRenamed(g, "_g")),
        (ranked[g] == F.col("_g"))
        & (ranked["_b"] == needb["_b"])
        & (F.col("_lr") + F.col("_start") == F.col("_rank")),
    ).select(ranked[g], "p", "_pos", "_rank", "_v")
    lo_rank_v = F.max(F.when(F.col("_rank") == F.floor("_pos"), F.col("_v")))
    hi_rank_v = F.max(F.when(F.col("_rank") == F.ceil("_pos"), F.col("_v")))
    return (
        vals.groupBy(g, "p", "_pos")
        .agg(lo_rank_v.alias("_lov"), hi_rank_v.alias("_hiv"))
        .select(
            F.col(g),
            F.col("p"),
            F.when(F.floor("_pos") == F.ceil("_pos"), F.col("_lov"))
            .otherwise(
                F.col("_lov") * (F.ceil("_pos") - F.col("_pos"))
                + F.col("_hiv") * (F.col("_pos") - F.floor("_pos"))
            )
            .alias("value"),
        )
    )
