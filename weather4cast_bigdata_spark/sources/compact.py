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

from pyspark.sql import DataFrame, SparkSession


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
