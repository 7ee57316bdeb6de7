"""Catalog: load the driver's star-schema parquet lake.

The reference's "catalog" is a filesystem walk + hard-coded schema
convention (``datasets.py:229-237, 256-269``). Here the lake is
partition-discoverable parquet; Catalyst gets partition pruning,
column pruning, and predicate pushdown for free.
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _first_part_file(path: str) -> str | None:
    """First part file of a parquet dataset dir, recursing into
    partitionBy subdirectories (e.g. ``band_idx=0/shard=3/…``) — a
    top-level-only scan would return nothing for hive-layout lakes
    and silently skip the TIMESTAMP(NANOS) defense."""
    for root, dirs, files in os.walk(path):
        dirs.sort()
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    return None


@lru_cache(maxsize=256)
def _ns_cols_cached(path: str, mtime_ns: int) -> tuple[str, ...]:
    if os.path.isdir(path):
        # Spark-written dataset directory: any part file carries the
        # unified footer schema (Spark writes one schema per job).
        part = _first_part_file(path)
        if part is None:
            return ()
        path = part
    schema = pq.read_schema(path)
    return tuple(
        f.name
        for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


def _ns_timestamp_cols(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) in the parquet footer.
    Cache is keyed on the path's mtime so an in-process rewrite of a
    dataset directory with a new schema is picked up, not served
    stale."""
    try:
        mtime_ns = os.stat(path).st_mtime_ns
    except OSError:
        mtime_ns = -1
    return _ns_cols_cached(path, mtime_ns)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one lake table.

    The driver writes pandas-style TIMESTAMP(NANOS) columns, which
    Spark's vectorized reader rejects; with
    ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as int64
    nanos and are converted here with integer division (no
    double-precision round-trip — 2^63 ns overflows a double's 53-bit
    mantissa). Truncation to micros matches DuckDB's read of the same
    files.
    """
    path = f"{sf_dir}/{name}.parquet"
    # Defensive: the driver may hand us a session built without these.
    # If a deployment pins them as static confs, setting raises — but
    # then the values are already decided, so proceed either way.
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    df = spark.read.parquet(path)
    for c in _ns_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count of a lake table from parquet FOOTER metadata —
    no Spark job. The scale-adaptive operators (LSH plane counts,
    SimHash block widths) need only ``count(*)`` of the raw table to
    pick their resolution; a ``df.count()`` launches a full scan
    stage per query for one scalar (r9's adaptive SimHash paid +0.5 s
    of its +38 % sf0.1 regression on exactly this, VERDICT r9 item
    3). Parquet row counts are footer statistics: pyarrow's
    ``count_rows`` folds them without touching data pages, O(#files)
    metadata reads on the driver. Falls back to the distributed
    ``df.count()`` for paths pyarrow can't open locally (object
    stores without a mounted filesystem) — at true cluster scale with
    millions of files THAT is the right engine anyway; this fast
    path serves the per-query derivation on directory-addressable
    lakes. Both paths return the identical integer, so derived plans
    (and their DuckDB oracle restatements over ``count(*)``) are
    unchanged."""
    try:
        import pyarrow.dataset as pads

        return pads.dataset(
            f"{sf_dir}/{name}.parquet", format="parquet"
        ).count_rows()
    except Exception:
        return load_table(spark, sf_dir, name).count()


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register each table as a temp view (mirrors the driver's DuckDB views)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def discover_views(spark: SparkSession, lake_dir: str) -> dict[str, DataFrame]:
    """Register every ``<name>.parquet`` under ``lake_dir`` as a temp
    view — the ad-hoc variant of ``register_views`` for lakes that
    don't carry the full star schema (used by the ``sql`` CLI mode).
    Names must be SQL identifiers; anything else is skipped."""
    dfs: dict[str, DataFrame] = {}
    for entry in sorted(os.listdir(lake_dir)):
        if not entry.endswith(".parquet"):
            continue
        name = entry[: -len(".parquet")]
        if not name.isidentifier():
            continue
        dfs[name] = load_table(spark, lake_dir, name)
        dfs[name].createOrReplaceTempView(name)
    return dfs
