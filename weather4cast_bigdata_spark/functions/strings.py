"""String / timestamp scalar functions (filename ↔ timestamp codec).

The reference encodes all time metadata in file paths
(``datasets.py:26-28, 256-269``); these functions are the Spark-native
codec for that convention.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# "...20190723T060000Z.nc" → timestamp. Reference: datasets.py:26-28.
TS_PATTERN = r"(\d{8}T\d{6})Z"
TS_FORMAT = "yyyyMMdd'T'HHmmss"


def parse_filename_ts(filename: Column) -> Column:
    """Extract the ``%Y%m%dT%H%M%SZ`` stamp from a frame filename.

    Reference: datasets.py:26-28.
    """
    return F.to_timestamp(F.regexp_extract(filename, TS_PATTERN, 1), TS_FORMAT)


def format_ts_filename(ts: Column, prefix: Column | str, suffix: str = ".nc") -> Column:
    """Build a frame filename from a timestamp. Reference: datasets.py:256-259."""
    pre = F.lit(prefix) if isinstance(prefix, str) else prefix
    return F.concat(pre, F.date_format(ts, TS_FORMAT), F.lit("Z" + suffix))


def day_of_year_dir(ts: Column) -> Column:
    """``%Y%j`` day-of-year directory component. Reference: datasets.py:258-259."""
    return F.date_format(ts, "yyyyDDD")


def format_frame_path(
    comp: Column | str, region: Column, subset: Column | str, ts: Column, product: Column
) -> Column:
    """Rebuild the reference's partition-path template
    ``comp/region/subset/%Y%j/product/`` — datasets.py:260-268."""
    comp_c = F.lit(comp) if isinstance(comp, str) else comp
    subset_c = F.lit(subset) if isinstance(subset, str) else subset
    return F.concat_ws("/", comp_c, region, subset_c, day_of_year_dir(ts), product)


def satellite_fallback_name(filename: Column) -> Column:
    """``MSG4`` → ``MSG2`` alternate-satellite substitution.

    Reference: datasets.py:86-89, 431.
    """
    return F.regexp_replace(filename, "MSG4", "MSG2")
