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
    """Schema-explicit JSONL read; malformed lines never fail the scan.

    ``keep_corrupt=False`` drops them in the scan itself
    (DROPMALFORMED) — a post-hoc ``_corrupt_record`` filter would
    break column-pruned queries (Spark forbids a raw JSON/CSV query
    whose only referenced column is the corrupt column, so even
    ``.count()`` on the filtered frame throws). ``keep_corrupt=True``
    returns the PERMISSIVE frame with ``_corrupt_record`` for
    quarantine inspection; select at least one data column alongside
    it (or cache first) when aggregating, for the same pruning rule.
    """
    if not keep_corrupt:
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_csv(df: DataFrame, path: str, compression: str | None = None) -> None:
    """CSV sink with header; quotes/escapes applied by Spark so text
    round-trips (the other common interchange format).

    The writer MUST share the reader's quoting convention: read_csv
    sets escape='"' (RFC-4180 doubled quotes), while Spark's write
    default escapes embedded quotes as \\" — a mismatch that makes the
    reader's DROPMALFORMED silently drop any row whose text contains a
    double quote. Explicit nullValue/emptyValue keep NULL and ""
    distinct through the round-trip (default reads "" back as NULL).
    """
    w = (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("escape", '"')
        .option("nullValue", "\\N")
        .option("emptyValue", '""')
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType, keep_corrupt: bool = False
) -> DataFrame:
    """Schema-explicit CSV read — same discipline and corrupt-line
    handling as :func:`read_jsonl` (no inferSchema pass; DROPMALFORMED
    clean path so column-pruned queries never trip the
    corrupt-column-only restriction).

    ``multiLine`` + quote-escape are on so text containing embedded
    newlines round-trips the writer's quoting; the cost is that
    multiLine CSV files are not line-splittable (one task per file) —
    size interchange files accordingly, or prefer JSONL, whose
    one-record-per-line framing keeps splittability.
    """
    common = (
        spark.read.option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        # mirror write_csv: \N marks NULL; the writer's quoted ""
        # reads back as empty string under the default emptyValue
        .option("nullValue", "\\N")
    )
    if not keep_corrupt:
        return common.schema(schema).option("mode", "DROPMALFORMED").csv(path)
    full = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
    return (
        common.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
