"""Flagship end-to-end plan: the ``evaluate`` entry point re-read as a
relational query (SURVEY.md §3.2, §7 M0).

The reference's evaluate streams (prediction, truth) frame pairs
through per-variable losses and folds them into inverse-variance-
weighted totals (``main.py:113-140``, ``models.py:304-318``). The
events table plays the frame stream: ``event_type`` ≈ variable,
``(user_id, slot)`` ≈ (region, time), 15-min slots ≈ frame cadence
(``datasets.py:175``), and a lag-1 persistence forecast plays the
model. One query touching scan → projection → agg → as-of self-join →
loss agg → weight join → sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.operators.aggregates import mse
from weather4cast_bigdata_spark.operators.joins import join_offset, join_static_broadcast
from weather4cast_bigdata_spark.operators.windows import with_time_slot
from weather4cast_bigdata_spark.sources.catalog import load_table


def flagship_evaluate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variable persistence-forecast MSE with inverse-variance
    weights, plus each variable's weighted contribution."""
    # No fan-out here: the four frame branches run as concurrent
    # stages, so the single-file scan already uses multiple cores in
    # aggregate; an up-front repartition just adds four exchanges
    # (measured slower at sf0.1).
    events = load_table(spark, sf_dir, "events")

    # Frame table: one value per (variable, key, 15-min slot). Four
    # subplans consume it (both as-of sides, the variance weights and
    # their normalizer); the branches recompute it — measured cheaper
    # here than a persist() barrier, whose cache build serializes the
    # otherwise-concurrent branch stages. At cluster scale with raw
    # events ≫ memory, persist the slot-aggregated table instead.
    frames = (
        with_time_slot(events, "ts", minutes=15)
        .groupBy("event_type", "user_id", "slot")
        .agg(F.avg("value").alias("value"))
    )

    # Persistence forecast: the frame exactly one slot earlier
    # (degenerate as-of join, datasets.py:322-323 analog).
    paired = join_offset(
        frames,
        keys=["event_type", "user_id"],
        ts_col="slot",
        offset_expr="INTERVAL 15 MINUTES",
        value_cols=["value"],
        suffix="_next",
    )

    # Per-variable loss (models.py:316 'mse' analog).
    losses = paired.groupBy("event_type").agg(
        mse(F.col("value"), F.col("value_next")).alias("mse"),
        F.count(F.lit(1)).alias("n_pairs"),
    )

    # Inverse-variance weights (models.py:304-318 analog) — a tiny
    # dim, broadcast-joined.
    # try_divide: a constant-valued variable (variance 0) must yield a
    # NULL weight, not an ANSI DIVIDE_BY_ZERO that kills the query.
    weights = (
        frames.groupBy("event_type")
        .agg(F.try_divide(F.lit(1.0), F.var_samp("value")).alias("inv_var"))
    )
    total_w = weights.agg(F.sum("inv_var").alias("w_sum"))
    weights = weights.crossJoin(F.broadcast(total_w)).select(
        "event_type", (F.col("inv_var") / F.col("w_sum")).alias("weight")
    )

    out = join_static_broadcast(losses, weights, on=["event_type"])
    # Tie-breaking epsilon before rounding — see plans.registry
    # numeric policy #3.
    return out.select(
        "event_type",
        F.col("n_pairs"),
        F.round(F.col("mse") + F.lit(1e-9), 6).alias("mse"),
        F.round(F.col("weight") + F.lit(1e-12), 9).alias("weight"),
        F.round(F.col("mse") * F.col("weight") + F.lit(1e-9), 6).alias("weighted_loss"),
    ).orderBy("event_type")


FLAGSHIP_ORACLE_SQL = """
WITH frames AS (
    SELECT event_type, user_id,
           make_timestamp(CAST(floor(epoch(ts)/900) AS BIGINT)*900*1000000) AS slot,
           avg(value) AS value
    FROM events
    GROUP BY 1, 2, 3
),
paired AS (
    SELECT f.event_type, f.user_id, f.slot, f.value, n.value AS value_next
    FROM frames f
    JOIN frames n
      ON n.event_type = f.event_type AND n.user_id = f.user_id
     AND n.slot = f.slot + INTERVAL 15 MINUTES
),
losses AS (
    SELECT event_type, avg(pow(value - value_next, 2)) AS mse,
           count(*) AS n_pairs
    FROM paired GROUP BY 1
),
w AS (
    SELECT event_type, 1.0 / var_samp(value) AS inv_var FROM frames GROUP BY 1
),
wn AS (
    SELECT event_type, inv_var / (SELECT sum(inv_var) FROM w) AS weight FROM w
)
SELECT l.event_type, l.n_pairs, round(l.mse + 1e-9, 6) AS mse,
       round(wn.weight + 1e-12, 9) AS weight,
       round(l.mse * wn.weight + 1e-9, 6) AS weighted_loss
FROM losses l JOIN wn ON wn.event_type = l.event_type
ORDER BY l.event_type
"""
