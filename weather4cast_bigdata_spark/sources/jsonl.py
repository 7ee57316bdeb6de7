"""JSON-lines source/sink — the interchange format training-data
pipelines actually exchange (one JSON document per line, splittable,
append-friendly).

Scale rules baked in:
- ALWAYS pass an explicit schema on read. ``inferSchema`` is a full
  extra pass over the lake before the real one — at 100 TB that is
  the single most expensive default in Spark.
- PERMISSIVE mode with a corrupt-record column: one malformed line in
  a billion must neither kill the job (FAILFAST) nor vanish silently
  (DROPMALFORMED); it lands in ``_corrupt_record`` for quarantine.
- zstd compression on write; JSONL stays line-splittable when
  uncompressed, and a compacted parquet copy is the query-side format
  (this sink is for interchange, not analytics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

CORRUPT_COL = "_corrupt_record"


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, keep_corrupt: bool = False
) -> DataFrame:
    """Schema-explicit JSONL read; malformed lines are quarantined to
    ``_corrupt_record`` (PERMISSIVE) instead of failing the scan."""
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)


def write_csv(df: DataFrame, path: str, compression: str | None = None) -> None:
    """CSV sink with header; quotes/escapes applied by Spark so text
    round-trips (the other common interchange format)."""
    w = df.write.mode("overwrite").option("header", "true")
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, keep_corrupt: bool = False
) -> DataFrame:
    """Schema-explicit CSV read, PERMISSIVE corrupt-line quarantine —
    same discipline as :func:`read_jsonl` (no inferSchema pass)."""
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    df = (
        spark.read.schema(full)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.where(df[CORRUPT_COL].isNull()).drop(CORRUPT_COL)
