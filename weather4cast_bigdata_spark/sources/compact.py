"""Lake-layout maintenance: size-targeted compaction with clustered
ordering.

Not a reference operator (its sink is one HDF5 per (region, day),
``datasets.py:444-459``); added because a 100 TB parquet lake lives or
dies by file layout: thousands of kB-sized files per partition turn
every scan into a listing+footer storm, while range-clustered,
size-bounded files give min/max-statistics pruning its teeth.

``write_compacted`` = repartitionByRange on the clustering keys (one
range shuffle → globally range-partitioned output, the 1-D analog of
Z-ordering) + sortWithinPartitions (rows inside each file are ordered,
so parquet row-group min/max stats are tight) + ``maxRecordsPerFile``
(bounds the upper file size; the range partitioning bounds the count).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_compacted(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    n_files: int,
    max_records_per_file: int | None = None,
) -> None:
    """Compact ``df`` into ~``n_files`` range-clustered parquet files.

    ``repartitionByRange`` samples the clustering keys to build
    balanced range bounds (skew-resistant without manual salting);
    ties on the sampled keys are broken deterministically by the
    in-partition sort. ``max_records_per_file`` caps rotation inside a
    range partition so one hot range cannot produce a multi-GB file.
    """
    writer = (
        df.repartitionByRange(n_files, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def parquet_file_count(path: str) -> int:
    """Data files written (excludes _SUCCESS / CRC bookkeeping)."""
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def read_compacted(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative integer keys —
    the space-filling-curve clustering value multi-dimensional lake
    layouts sort by. Range-clustering on the Z-value keeps rows close
    in BOTH dimensions inside each file, so parquet row-group min/max
    stats prune selective filters on EITHER column — a single-key
    sort can only serve one.

    Pure bit arithmetic (shiftleft/or over ``bits`` rounds), fully
    codegen'd and reproducible in any engine for the oracle. Inputs
    are masked to ``bits`` (callers quantize wider domains first —
    interleaving cares about locality, not exact values).
    """
    mask = (1 << bits) - 1
    av = a.cast("bigint").bitwiseAND(F.lit(mask))
    bv = b.cast("bigint").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftrightunsigned(av, i).bitwiseAND(F.lit(1)), 2 * i
        )
        bbit = F.shiftleft(
            F.shiftrightunsigned(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Z-order compaction: cluster files along the Morton curve of
    two columns (the two-dimensional analog of ``write_compacted``).
    Same skew-resistant ``repartitionByRange`` + in-file sort, keyed
    by the interleaved value; the temporary key is dropped before
    write so the lake schema is unchanged.

    Both keys are min/max-quantized to the ``bits`` range first (one
    tiny agg broadcast back): raw interleaving of unequal domains
    lets the wider key's high bits dominate the curve and the layout
    degenerates to a single-key sort — equalizing the scales is what
    buys locality in BOTH dimensions. Bounds cost one extra scan of
    two columns; pass a column pair already quantized to ``bits``
    and use ``zorder_key`` directly to avoid it.
    """
    bounds = df.agg(
        F.min(col_a).alias("_la"), F.max(col_a).alias("_ha"),
        F.min(col_b).alias("_lb"), F.max(col_b).alias("_hb"),
    )
    mask = (1 << bits) - 1

    def _scale(col: str, lo: str, hi: str) -> Column:
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1)).cast("bigint")
        return F.floor(
            (F.col(col).cast("bigint") - F.col(lo)) * F.lit(mask) / span
        ).cast("bigint")

    z = zorder_key(
        _scale(col_a, "_la", "_ha"), _scale(col_b, "_lb", "_hb"), bits=bits
    )
    writer = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("__z", z)
        .drop("_la", "_ha", "_lb", "_hb")
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
