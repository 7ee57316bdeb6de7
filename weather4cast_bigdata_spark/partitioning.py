"""Partitioning helpers: make CPU-bound narrow stages use the cluster.

Parquet scan parallelism is byte-driven (`files.maxPartitionBytes`),
which is the right default for I/O-bound plans but starves CPU-heavy
text/hash pipelines when the input is a few small files (or one
single-row-group file — unsplittable, so one task no matter the
config). At 100 TB inputs arrive in thousands of splits and these
helpers are no-ops; on small inputs they buy full-core parallelism
for the price of shuffling a few MB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, multiple: int = 1) -> DataFrame:
    """Round-robin repartition up to ``multiple × defaultParallelism``
    — only when the current plan has fewer partitions than that, so
    at real scale (scan splits ≫ cores) this is a no-op and adds no
    shuffle. Use ahead of CPU-dominated narrow stages (tokenize,
    shingle, hash, decode) whose cost per byte is far above a scan's.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * multiple
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
