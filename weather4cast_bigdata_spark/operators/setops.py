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
