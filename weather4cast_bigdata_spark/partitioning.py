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


#: Row budget per task for :func:`ensure_scan_parallelism`. 2048
#: rows ≈ a few hundred ms of LSH signature kernel + bucket-meeting
#: enumeration per task at the similarity family's work targets; at
#: the ≤2k-row bench gates the derived target is 1 partition, so
#: gate plans (and the committed plan-shape budgets) are unchanged.
SCAN_ROWS_PER_TASK = 2048


def ensure_scan_parallelism(
    df: DataFrame, n_rows: int | None, rows_per_task: int = SCAN_ROWS_PER_TASK
) -> DataFrame:
    """Row-budgeted sibling of :func:`ensure_min_parallelism` for
    callers that KNOW the corpus row count: repartition a
    parallelism-deficient input scan before heavy per-row stages
    (guide §2.5 "input skew — one huge unsplittable file /
    repartition immediately after the read").

    The LSH similarity family's expensive work — Arrow signature
    kernels, probe explodes, bucket-meeting enumeration and the
    candidate partial aggregate — all runs in the SCAN's
    partitioning: every join below it is a broadcast (census,
    hot-key anti-join, small exact sides), so nothing re-partitions
    until the pair distinct. A corpus that arrives as one (or few)
    parquet files therefore runs those stages on one (or few) cores
    no matter how many the cluster has — measured 31.9 → 11.3 s on
    `sim_lsh_multiprobe_bounded` at the 100× lake (a single 28 MB
    file → 7 skewed scan splits on 32 cores), the whole of its
    former "super-linear decade" (r12; SCALING.md §7f).

    Scale-adaptive, never a constant: the target is
    ``min(defaultParallelism, ceil(n_rows / rows_per_task))`` and
    the round-robin exchange fires only when the scan has FEWER
    partitions than that — a table big enough to arrive in many
    splits (any real 100 TB lake) or a corpus small enough to fit
    one task's budget passes through untouched. Unlike the
    unconditional floor above (right for text pipelines whose
    per-row cost dwarfs an exchange at ANY size), the row budget
    keeps tiny-gate plans exchange-free. ``n_rows=None`` (unknown
    corpus size) never repartitions."""
    if n_rows is None:
        return df
    sc = df.sparkSession.sparkContext
    want = min(sc.defaultParallelism, -(-n_rows // rows_per_task))
    if want > 1 and df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
