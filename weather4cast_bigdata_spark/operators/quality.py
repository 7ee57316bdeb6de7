"""Data-quality auditing: declarative constraint checks and numeric
profiling in single aggregation passes (a Deequ-style layer, sized
for 100 TB).

Not a reference operator (its validation is defensive CLI asserts,
``main.py:11,260-272``); added because corpus curation lives on
constraint dashboards — null rates, domain violations, key
uniqueness, value distributions — and the scale discipline is that an
audit of N rules costs ONE scan with map-side-combined counters, not
N scans.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_audit(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Evaluate named row-level constraints in one aggregation pass.

    Each rule is a boolean Column; a row VIOLATES the rule unless the
    predicate is TRUE — a NULL predicate counts as a violation (the
    conservative read: an unverifiable row is not a verified row).
    Returns the long form ``(rule, n_violations, n_rows)``, one row
    per rule, emitted via a zero-shuffle unpivot of the single
    aggregate row.
    """
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(name)
        for name, cond in rules.items()
    ]
    wide = df.agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    return wide.unpivot(["n_rows"], list(rules), "rule", "n_violations").select(
        "rule", "n_violations", "n_rows"
    )


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Rows in excess of one per key — the primary-key duplication
    count: ``n_rows − n_distinct_keys``. One shuffle on the key
    (map-side combined count per key would also work; the two-phase
    distinct aggregate lets Catalyst pick)."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])).alias(
            "n_duplicate_rows"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def numeric_histogram(df: DataFrame, col: str, n_bins: int = 10) -> DataFrame:
    """Fixed-width histogram over the column's [min, max] span:
    ``(bin, bin_lo, bin_hi, n)``. Two passes — a 1-row min/max
    aggregate broadcast back, then a map-side-combined bin count —
    which is the floor for a data-dependent binning. The top edge is
    closed (x == max lands in the last bin). NULLs are excluded.
    """
    span = df.where(F.col(col).isNotNull()).agg(
        F.min(col).alias("__lo"), F.max(col).alias("__hi")
    )
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))
    binned = (
        df.where(F.col(col).isNotNull())
        .crossJoin(F.broadcast(span))
        .select(
            F.least(
                F.floor((F.col(col) - F.col("__lo")) / width).cast("bigint"),
                F.lit(n_bins - 1).cast("bigint"),
            ).alias("bin"),
            "__lo",
            "__hi",
        )
    )
    return (
        binned.groupBy("bin", "__lo", "__hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.col("__lo") + F.col("bin") * (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))).alias("bin_lo"),
            (F.col("__lo") + (F.col("bin") + 1) * (F.col("__hi") - F.col("__lo")) / F.lit(float(n_bins))).alias("bin_hi"),
            "n",
        )
    )
