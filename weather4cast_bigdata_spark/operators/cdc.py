"""Change-data-capture apply: the lakehouse MERGE INTO analog.

Not a reference operator (its lake is immutable per-day files,
``datasets.py:256-269``); added because every production corpus/lake
this engine targets is maintained incrementally — late corrections,
document takedowns, re-crawls — and "rewrite the table with a batch
of keyed changes" is the operator that makes that tractable without a
table format's transaction log.

Scale shape: one shuffle of the (small) change batch to pick the
latest change per key, then ONE left anti/semi-style join of the base
on the key — the base table never shuffles twice, and AQE broadcasts
the change batch when it is small (the common case: daily deltas are
a fraction of the base).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

UPSERT = "upsert"
DELETE = "delete"


def latest_changes(
    changes: DataFrame, keys: Sequence[str], seq_col: str, op_col: str = "op"
) -> DataFrame:
    """Collapse a change stream to the winning change per key:
    highest ``seq_col`` wins; ties broken by preferring DELETE (the
    conservative read of simultaneous conflicting writes), matching
    the oracle's deterministic ordering."""
    w = Window.partitionBy(*keys).orderBy(
        F.desc(seq_col), F.when(F.col(op_col) == DELETE, 0).otherwise(1)
    )
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MERGE semantics over plain DataFrames: rows of ``base`` whose
    key has any winning change are dropped, then winning upserts are
    appended — i.e. upsert = replace-or-insert, delete = remove.
    ``changes`` must carry the base columns plus ``op_col``/``seq_col``.

    One wide shuffle total for the base: the left_anti join on the
    key. The change side is change-batch-sized throughout.
    """
    latest = latest_changes(changes, keys, seq_col, op_col)
    survivors = base.join(latest.select(*keys), on=list(keys), how="left_anti")
    upserts = latest.where(F.col(op_col) == UPSERT).select(*base.columns)
    return survivors.unionByName(upserts)
