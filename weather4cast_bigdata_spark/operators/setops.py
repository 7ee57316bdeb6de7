"""Set operators: time-index intersection, dedup, seeded shuffle.

Reference: the valid-start-time computation intersects per-(product,
region) time sets (``datasets.py:229-240``); epoch shuffling is a
seeded permutation (``datasets.py:245,251-254``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def intersect_all_sets(dfs: Sequence[DataFrame]) -> DataFrame:
    """INTERSECT of k single/multi-column sets (valid start times
    across products × regions). Reference: datasets.py:238-240."""
    return reduce(lambda a, b: a.intersect(b), dfs)


def distinct_sorted(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Deduplicated, sorted index (the time index as a sorted set).

    Reference: datasets.py:31-36,47.
    """
    return df.select(*cols).distinct().orderBy(*cols)


def seeded_shuffle(df: DataFrame, seed: int) -> DataFrame:
    """Deterministic pseudo-random permutation — the epoch shuffle.

    Reference: datasets.py:245,251-254 (np.random with fixed seed).
    ``rand(seed)`` is deterministic for a fixed partitioning; callers
    that need cross-run stability should repartition first.
    """
    return df.orderBy(F.rand(seed))


def stratified_split(
    df: DataFrame,
    id_col: str,
    fractions: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "validation", "test"),
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment by hashed id —
    the split every training-data pipeline needs ahead of export.

    The reference hard-codes its subsets as directory partitions
    (``datasets.py:233,263-265``); here the assignment itself is an
    engine op: bucket = md5-derived 60-bit hash of ``(seed, id)`` mod
    100, cut at the cumulative fraction boundaries. Pure narrow
    projection — no shuffle, no RNG state, identical on any cluster
    size or partitioning, and stable under corpus growth (a document's
    split never changes when other documents arrive — the property
    fraction-based ``randomSplit`` cannot give).
    """
    from weather4cast_bigdata_spark.functions.text import md5_hash64

    bucket = md5_hash64(
        F.concat_ws("_", F.lit(str(seed)), F.col(id_col).cast("string"))
    ) % 100
    expr = F.lit(labels[-1])
    cum = 0.0
    cuts = []
    for frac, label in zip(fractions[:-1], labels[:-1]):
        cum += frac * 100
        cuts.append((cum, label))
    for cut, label in reversed(cuts):
        expr = F.when(bucket < F.lit(int(round(cut))), F.lit(label)).otherwise(expr)
    return df.withColumn(out_col, expr)
