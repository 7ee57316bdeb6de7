"""Join operators.

The reference's joins are dict probes and filesystem lookups
(SURVEY.md §2.3); here each becomes a declarative equi join whose
physical strategy (broadcast vs sort-merge) Catalyst + AQE pick.
Scale notes per operator: dimension sides are explicitly
``broadcast()``-hinted so a 1000-executor plan never shuffles the
fact table for a kB-sized dim.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def join_static_broadcast(
    fact: DataFrame, dim: DataFrame, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Attach a small static dimension (geo grid / region offsets /
    per-variable constants) to every fact row.

    Reference: datasets.py:328-330,151-162 (static lat/lon/elev
    channels), datasets.py:113-125 (region-offset table).
    Broadcast-hinted: the dim never exceeds a few MB by design.
    """
    return fact.join(F.broadcast(dim), on=list(on), how=how)


def join_fallback(
    primary: DataFrame,
    alternate: DataFrame,
    on: Sequence[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Primary source with per-key fallback to an alternate source:
    left join + coalesce.

    Reference: datasets.py:86-89 (MSG4→MSG2 satellite fallback) and
    datasets.py:430-435 (previous-day directory fallback). With a
    distinct ``out_col`` the primary's raw ``value_col`` is KEPT —
    the point of naming the filled column separately is comparing raw
    vs filled (e.g. counting fallback hits).
    """
    out = out_col or value_col
    alt = alternate.withColumnRenamed(value_col, "__alt_value")
    joined = primary.join(alt, on=list(on), how="left")
    return joined.withColumn(
        out, F.coalesce(F.col(value_col), F.col("__alt_value"))
    ).drop("__alt_value")


def join_offset(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    offset_expr: str,
    value_cols: Sequence[str],
    suffix: str = "_future",
) -> DataFrame:
    """Degenerate as-of join: align each row with the row exactly
    ``offset`` later on the same keys (equi join after a timestamp
    shift). Reference: datasets.py:322-323 (targets start at
    t0 + 4·15 min relative to predictors).
    """
    shifted = df.select(
        *keys,
        (F.col(ts_col) - F.expr(offset_expr)).alias(ts_col),
        *[F.col(c).alias(c + suffix) for c in value_cols],
    )
    return df.join(shifted, on=[*keys, ts_col], how="inner")


def range_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Interval (range) join — ``start <= ts < end`` — as an equi join.

    Spark has no native range-join strategy: a raw inequality join
    plans as BroadcastNestedLoopJoin, O(|facts|·|intervals|) work that
    is the canonical scale-killer. Binning recovers an equi join: each
    fact maps to exactly ONE bin of width ``bin_seconds``; each
    interval explodes to every bin it overlaps; the equi join on
    (keys…, bin) is then refined with the exact predicate. Every
    surviving (fact, interval) match appears exactly once — the fact's
    bin is unique, so no dedup pass is needed.

    Pick ``bin_seconds`` near the typical interval length: the
    interval explode factor is ``len/bin + 1``, while a too-large bin
    widens each equi bucket. Sub-second timestamps ride the binning
    via the fractional epoch cast; an interval whose exclusive end
    sits exactly on a bin boundary contributes one (empty) extra bin —
    harmless, the exact predicate refines.
    """
    # Integer microsecond arithmetic (no double rounding at epoch
    # scale); the cast("timestamp") makes TIMESTAMP_NTZ inputs
    # binnable too — a no-op for TimestampType, and the session tz is
    # pinned UTC so NTZ semantics are preserved.
    bin_us = F.lit(int(bin_seconds) * 1_000_000)

    def _bin(col: str) -> Column:
        return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / bin_us).cast("bigint")

    f = facts.withColumn("__bin", _bin(ts_col))
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(_bin(start_col), _bin(end_col)))
    )
    joined = f.join(iv, on=[*keys, "__bin"], how="inner")
    return joined.where(
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Interval×interval overlap join — ``l_start <= r_end AND
    r_start <= l_end`` (closed ends) — as a dedup-free equi join.

    The interval generalization of ``range_join_binned``: BOTH sides
    explode to their covered bins, the equi join runs on
    (keys…, bin), and the exact predicate refines. Because two
    overlapping intervals share every bin their intersection covers,
    a naive bin join emits each pair once per shared bin; the
    first-shared-bin guard — keep a match only in the bin containing
    ``greatest(l_start, r_start)``, which for overlapping intervals
    lies inside BOTH — makes every surviving pair appear exactly
    once, so no distinct() shuffle is needed. Explode factor is
    ``len/bin + 1`` per side; pick ``bin_seconds`` near the shorter
    side's typical length.
    """
    bin_us = F.lit(int(bin_seconds) * 1_000_000)

    def _us(col: str) -> Column:
        return F.unix_micros(F.col(col).cast("timestamp"))

    def _bin(col: str) -> Column:
        return F.floor(_us(col) / bin_us).cast("bigint")

    l = left.withColumn("__bin", F.explode(F.sequence(_bin(left_start), _bin(left_end))))
    r = right.withColumn(
        "__bin", F.explode(F.sequence(_bin(right_start), _bin(right_end)))
    )
    joined = l.join(r, on=[*keys, "__bin"], how="inner")
    return joined.where(
        (F.col(left_start) <= F.col(right_end))
        & (F.col(right_start) <= F.col(left_end))
        & (
            F.col("__bin")
            == F.floor(F.greatest(_us(left_start), _us(right_start)) / bin_us)
        )
    ).drop("__bin")


def join_multichannel(
    df: DataFrame,
    keys: Sequence[str],
    channel_col: str,
    value_col: str,
    channels: Sequence[str],
    agg: str = "avg",
) -> DataFrame:
    """Align k channel streams on the same key into one wide record —
    the CTTH+CRR+ASII+CMA channel stack.

    Reference: datasets.py:326-336. Implemented as groupBy().pivot()
    with an explicit channel list (no extra distinct-scan; one
    shuffle on the grouping keys, map-side partial aggregation).
    """
    fn = getattr(F, agg)
    return (
        df.groupBy(*keys)
        .pivot(channel_col, list(channels))
        .agg(fn(F.col(value_col)))
    )


def join_ensemble_align(
    members: dict[str, DataFrame], on: Sequence[str], value_col: str
) -> DataFrame:
    """Zip k member-model prediction streams by key for blending
    (positional zip in the reference becomes key-based equi join).

    Reference: ensemble.py:86-91, main.py:168-179.
    """
    out: DataFrame | None = None
    for name, df in members.items():
        sel = df.select(*on, F.col(value_col).alias(f"pred_{name}"))
        out = sel if out is None else out.join(sel, on=list(on), how="inner")
    assert out is not None, "need at least one member"
    return out


def weighted_blend(
    df: DataFrame, pred_cols: Sequence[str], weights: Sequence[float], out_col: str = "blend"
) -> DataFrame:
    """Σ wᵢ·predᵢ — pure column arithmetic, not a UDF.

    Reference: ensemble.py:81-101 (weighted_model), main.py:10-33.
    """
    expr: Column = F.lit(0.0)
    for c, w in zip(pred_cols, weights):
        expr = expr + F.col(c) * F.lit(float(w))
    return df.withColumn(out_col, expr)


def logit_blend(
    df: DataFrame,
    pred_cols: Sequence[str],
    weights: Sequence[float],
    out_col: str = "blend",
) -> DataFrame:
    """Blend in normlogit space then invert — the ASII blending mode.

    Reference: ensemble.py:86-101 (logit=True path), main.py:99-103.
    """
    from weather4cast_bigdata_spark.functions.scalar import inv_normlogit, normlogit

    expr: Column = F.lit(0.0)
    for c, w in zip(pred_cols, weights):
        expr = expr + normlogit(F.col(c)) * F.lit(float(w))
    return df.withColumn(out_col, inv_normlogit(expr))


def fuzzy_self_join_blocked(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int = 1,
) -> DataFrame:
    """Entity-resolution (record-linkage) self-join: candidate pairs
    from a BLOCKING key, verified with Levenshtein edit distance —
    the standard two-phase fuzzy-match shape. An unblocked fuzzy
    join is O(n²) edit-distance evaluations (the canonical
    scale-killer for string matching); blocking turns candidate
    generation into a shuffled EQUI join whose cost tracks block
    populations, and only candidates pay the O(len²) distance DP.
    Blocking is a RECALL knob (a true match split across blocks is
    missed — same contract as LSH banding / `max_df`), never a
    precision one: every emitted pair passed the exact distance
    test. ``a < b`` on the id dedups the pair space."""
    lhs = df.select(
        F.col(id_col).alias("a_id"),
        F.col(name_col).alias("a_name"),
        block.alias("_blk"),
    )
    rhs = df.select(
        F.col(id_col).alias("b_id"),
        F.col(name_col).alias("b_name"),
        block.alias("_blk"),
    )
    return (
        lhs.join(rhs, "_blk")
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("edit_dist", F.levenshtein("a_name", "b_name"))
        .where(F.col("edit_dist") <= max_dist)
        .select("a_id", "b_id", "edit_dist")
    )
