"""Window / time-series operators: sequence assembly, validity
filtering, day-boundary handling.

The reference materializes 4-past + 32-future frame sequences into a
dense batch tensor (``datasets.py:303-347``); here sequences are
window functions over a ``(keys..., ts)``-sorted frame table — one
shuffle on the partition keys, then pure sorted-scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_time_slot(df: DataFrame, ts_col: str, minutes: int = 15, out_col: str = "slot") -> DataFrame:
    """Snap event timestamps to the frame cadence grid (15-min slots).

    Reference cadence: datasets.py:16,175 (timedelta(minutes=15)).
    """
    secs = minutes * 60
    return df.withColumn(
        out_col,
        F.timestamp_seconds((F.unix_timestamp(F.col(ts_col)) / secs).cast("bigint") * secs),
    )


def past_sequence(
    df: DataFrame, keys: Sequence[str], ts_col: str, value_col: str, n_past: int = 4
) -> DataFrame:
    """Gather the current + (n_past-1) preceding frames per key as
    ``lag`` columns (the 4-frame predictor window).

    Reference: datasets.py:303-347 (loop 325-337), sequence_length
    datasets.py:16,173.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    out = df
    for i in range(1, n_past):
        out = out.withColumn(f"{value_col}_lag{i}", F.lag(value_col, i).over(w))
    return out


def future_horizon(
    df: DataFrame, keys: Sequence[str], ts_col: str, value_col: str, n_future: int = 32
) -> DataFrame:
    """Gather n_future following frames per key as ``lead`` columns
    (the 32-frame target horizon). Reference: datasets.py:322-337.
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    out = df
    for i in range(1, n_future + 1):
        out = out.withColumn(f"{value_col}_lead{i}", F.lead(value_col, i).over(w))
    return out


def filter_valid_sequence(
    slots: DataFrame,
    keys: Sequence[str],
    slot_col: str = "slot",
    n_slots: int = 4,
    cadence_minutes: int = 15,
) -> DataFrame:
    """Keep start slots where all ``n_slots`` consecutive cadence
    slots exist for the key — the sequence-validity filter.

    Reference: datasets.py:39-47 (all 36 15-min slots present).
    Implemented with ``lead`` on the deduplicated slot grid: slot i+k
    must equal slot + k·cadence for every k < n_slots. Works on
    irregular grids (no regular-spacing assumption) with a single
    shuffle on ``keys``; equivalent to the time-spine join of
    SURVEY.md §4 but cheaper (no spine materialization).
    """
    w = Window.partitionBy(*keys).orderBy(slot_col)
    out = slots.select(*keys, slot_col).distinct()
    cond = F.lit(True)
    for k in range(1, n_slots):
        cond = cond & (
            F.lead(slot_col, k).over(w)
            == F.col(slot_col) + F.expr(f"INTERVAL {k * cadence_minutes} MINUTES")
        )
    return out.withColumn("__valid", cond).where(F.col("__valid")).drop("__valid")


def prev_value_fallback(
    df: DataFrame, keys: Sequence[str], order_col: str, value_col: str, out_col: str | None = None
) -> DataFrame:
    """Carry the last non-null value forward — use yesterday's frame
    when today's is missing. Reference: datasets.py:430-435.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col or value_col, F.last(value_col, ignorenulls=True).over(w))


def day_boundary_correct(df: DataFrame, ts_col: str, out_col: str = "day_dir") -> DataFrame:
    """Stamp midnight start times with the *previous* day's ``%Y%j``
    directory. Reference: datasets.py:450-454.
    """
    ts = F.col(ts_col)
    # hour+minute only, exactly as the reference tests it — a
    # 00:00:30 stamp still counts as midnight (datasets.py:451)
    is_midnight = (F.hour(ts) == 0) & (F.minute(ts) == 0)
    eff = F.when(is_midnight, ts - F.expr("INTERVAL 1 DAY")).otherwise(ts)
    return df.withColumn(out_col, F.date_format(eff, "yyyyDDD"))


def argmin_best(
    df: DataFrame, keys: Sequence[str], order_cols: Sequence[str], n: int = 1
) -> DataFrame:
    """Top-n per key (the best-checkpoint pattern: keep the model with
    minimum validation loss). Reference: models.py:453-470.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_minutes: int = 30,
    order_tiebreak: Sequence[str] = (),
    out_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts whenever the gap
    to the previous event of the same key exceeds ``gap_minutes``.

    lag + cumulative sum over one (key, ts)-ordered window — a single
    shuffle on the key; the batch twin of Structured Streaming's
    ``session_window``. Gap comparison runs on exact microseconds, so
    the cut is engine-stable.
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    # cast covers TIMESTAMP_NTZ inputs (unix_micros only takes TIMESTAMP);
    # gap deltas are invariant under the session-timezone reinterpretation
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_session = F.when(
        prev_us.isNull() | ((ts_us - prev_us) > gap_minutes * 60_000_000),
        1,
    ).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(new_session).over(cum))


def join_asof(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    right_val_cols: Sequence[str],
    right_ts_as: str | None = None,
) -> DataFrame:
    """Backward as-of join: attach each right-side value as of the
    latest right row with ``right.ts <= left.ts`` per key.

    Implemented as union + one ordered window scan (last non-null),
    NOT as a range join — the range-join form explodes to
    O(|left|·|right|) per key before filtering; this form is one
    shuffle on the key and a linear scan, the only shape that
    survives 100 TB. Right rows at the exact left timestamp are
    visible (right sorts before left on ties).
    """
    keys = list(keys)
    lcols = left.columns
    l = left.withColumn("_side", F.lit(0))
    for c in right_val_cols:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    if right_ts_as:
        l = l.withColumn("_r_ts", F.lit(None).cast(right.schema[ts_col].dataType))
    r = right.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_val_cols],
        *([F.col(ts_col).alias("_r_ts")] if right_ts_as else []),
    )
    u = l.select(
        *keys, ts_col, "_side",
        *[f"_r_{c}" for c in right_val_cols],
        *(["_r_ts"] if right_ts_as else []),
        *[F.col(c) for c in lcols if c not in keys + [ts_col]],
    ).unionByName(r, allowMissingColumns=True)
    # _side descending: right=1 sorts BEFORE left=0 at equal ts, so a
    # right row at the exact left timestamp is visible to the left row.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in right_val_cols:
        out = out.withColumn(c + "_asof", F.last(f"_r_{c}", ignorenulls=True).over(w))
    if right_ts_as:
        out = out.withColumn(right_ts_as, F.last("_r_ts", ignorenulls=True).over(w))
    drop = ["_side"] + [f"_r_{c}" for c in right_val_cols] + (["_r_ts"] if right_ts_as else [])
    return out.where(F.col("_side") == 0).drop(*drop)


def ewma(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    lookback: int = 8,
    order_tiebreak: Sequence[str] = (),
    out_col: str = "ewma",
) -> DataFrame:
    """Bounded-lookback exponentially weighted moving average per key:
    ``Σ αᵏ·x_{t−k} / Σ αᵏ`` over the last ``lookback`` rows.

    The textbook recursive EWMA is a sequential scan — inexpressible
    as a window aggregate and a scale dead-end. Truncating at
    ``lookback`` terms (αᵏ below ~1e-3 contributes nothing at α=0.5)
    turns it into ``lookback`` ``lag`` reads over ONE ordered window —
    a single shuffle on the key, fully codegen'd, and the weight
    renormalization over the available prefix keeps the head of each
    series unbiased. Deterministic tie-break columns make the result
    engine-stable (rounded per numeric policy #3).
    """
    order = [F.col(ts_col), *[F.col(c) for c in order_tiebreak]]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    num = F.lit(0.0)
    den = F.lit(0.0)
    for k in range(lookback):
        lagged = F.col(value_col) if k == 0 else F.lag(F.col(value_col), k).over(w)
        wk = F.lit(float(alpha) ** k)
        num = num + F.coalesce(lagged * wk, F.lit(0.0))
        den = den + F.when(lagged.isNotNull(), wk).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.round(num / den + F.lit(1e-9), 6))


def resample_interpolate(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    minutes: int = 15,
) -> DataFrame:
    """Regularize an irregular series onto a fixed cadence with
    linear interpolation — the gap-fill every sensor/frame cadence
    pipeline needs before windowed modeling (the batch generalization
    of the reference's previous-day fallback, datasets.py:200-210).

    Per key: densify to the full [min, max] slot lattice
    (``sequence`` + explode — a narrow per-key expansion, no
    shuffle), left-join the observed slot means, then bridge each
    gap with the linear interpolant between its bounding
    observations. The bracketing scan is two ordered window passes
    (``last/first IGNORE NULLS``) over the key partition — one
    shuffle on the key total; no Python, no iteration. Leading /
    trailing gaps (no bracket on one side) hold the nearest
    observation flat. Emits ``is_observed`` so downstream quality
    filters can weight real vs imputed samples.
    """
    from pyspark.sql import Window

    slot_us = 60_000_000 * minutes
    obs = (
        with_time_slot(df, ts_col, minutes=minutes, out_col="_slot")
        .groupBy(*key_cols, "_slot")
        .agg(F.round(F.avg(value_col) + F.lit(1e-9), 6).alias("_v"))
    )
    spine = (
        obs.groupBy(*key_cols)
        .agg(F.min("_slot").alias("_lo"), F.max("_slot").alias("_hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"INTERVAL {minutes} MINUTES"))
            ).alias("_slot"),
        )
    )
    dense = spine.join(obs, [*key_cols, "_slot"], "left")
    w_prev = (
        Window.partitionBy(*key_cols)
        .orderBy("_slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*key_cols)
        .orderBy("_slot")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    us = F.unix_micros(F.col("_slot"))
    marked = dense.select(
        *key_cols,
        F.col("_slot").alias(ts_col),
        F.col("_v"),
        F.last("_v", ignorenulls=True).over(w_prev).alias("_pv"),
        F.last(F.when(F.col("_v").isNotNull(), us), ignorenulls=True)
        .over(w_prev)
        .alias("_pt"),
        F.first("_v", ignorenulls=True).over(w_next).alias("_nv"),
        F.first(F.when(F.col("_v").isNotNull(), us), ignorenulls=True)
        .over(w_next)
        .alias("_nt"),
        us.alias("_t"),
    )
    frac = (F.col("_t") - F.col("_pt")) / F.greatest(
        F.col("_nt") - F.col("_pt"), F.lit(slot_us)
    )
    interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * frac
    filled = (
        F.when(F.col("_v").isNotNull(), F.col("_v"))
        .when(F.col("_pv").isNull(), F.col("_nv"))
        .when(F.col("_nv").isNull(), F.col("_pv"))
        .otherwise(interp)
    )
    return marked.select(
        *key_cols,
        ts_col,
        F.round(filled + F.lit(1e-9), 6).alias("value"),
        F.col("_v").isNotNull().alias("is_observed"),
    )
