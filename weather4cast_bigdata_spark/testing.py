"""Local replica of the driver's correctness gate: run a registry
query on Spark and its oracle SQL on DuckDB, compare row count,
column names, and (order-insensitively) values.

Used by tests/ so every operator is verified the same way the driver
verifies it (CORRECTNESS_r{N}.json).

Round-3 change: the default comparison is now **strict** — dtype
kinds must match (an int64 Spark column vs a float64 DuckDB column is
a FAILURE even when the values are numerically equal, because the
driver hashes exact values and ``0`` != ``0.0``) and float values
must be bit-exact.  The round-2 driver caught two oracle HUGEINT →
float64 coercions (`curation_source_stats`, `window_sessionize`)
that the old 1e-9-relative-tolerance comparator waved through; the
strict mode makes local green imply driver green.  Pass
``strict=False`` to get the old tolerant behaviour for diagnosing
*how far apart* mismatched values are.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from weather4cast_bigdata_spark.sources.catalog import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int
    oracle_rows: int


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _is_date_object(s: pd.Series) -> bool:
    """Spark DATE columns arrive in pandas as object dtype holding
    ``datetime.date``; DuckDB DATE arrives as datetime64[us].  The
    driver's hash treats these as equal (join_multichannel &c passed
    r1/r2), so both map to the datetime class here."""
    import datetime as _dt

    if s.dtype != object:
        return False
    nn = s.dropna()
    if nn.empty:
        return False
    v = nn.iloc[0]
    return isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)


def _dtype_kind(s: pd.Series) -> str:
    """Collapse a pandas dtype to the equivalence class the driver's
    hash distinguishes: integer / float / bool / datetime / other.
    datetime is one class because both engines' timestamps are
    canonicalised to strings before compare (mirrors the driver rows
    that already hash-match on timestamp columns)."""
    if pd.api.types.is_datetime64_any_dtype(s) or _is_date_object(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif _is_date_object(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _col_equal_vectorized(sv: pd.Series, ov: pd.Series, strict: bool) -> bool:
    """C-speed equality for the common column dtypes — at sf1 the
    row-by-row Python loop is minutes per 6M-row query; this path is
    exact-identical semantics for the dtypes it accepts (bit-equal
    floats with NaN==NaN, plain == elsewhere) and returns False for
    anything it can't prove, handing off to the loop (which also
    produces the per-row diagnostic on real mismatches)."""
    import numpy as np

    try:
        if (
            strict
            and pd.api.types.is_float_dtype(sv)
            and pd.api.types.is_float_dtype(ov)
        ):
            return bool(
                np.array_equal(
                    sv.to_numpy(dtype="float64"),
                    ov.to_numpy(dtype="float64"),
                    equal_nan=True,
                )
            )
        for kind in (
            pd.api.types.is_integer_dtype,
            pd.api.types.is_bool_dtype,
        ):
            if kind(sv) and kind(ov):
                a, b = sv.to_numpy(), ov.to_numpy()
                return bool((a == b).all())
        if sv.dtype == object and ov.dtype == object:
            # _canon already stringified object columns (None -> 'None'
            # consistently on both sides)
            return bool((sv.to_numpy() == ov.to_numpy()).all())
    except Exception:
        return False
    return False


def _values_equal(a, b, strict: bool, tol=1e-9) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        if strict:
            return fa == fb
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    return a == b


#: Modulus of the order-invariant value digest (Mersenne 2^61-1):
#: per-row 60-bit hashes sum without overflow inside DECIMAL(38,0)
#: (Spark) / HUGEINT (DuckDB) up to ~1e18 rows before the fold.
DIGEST_MOD = 2_305_843_009_213_693_951


def digest_exprs(schema) -> tuple[str, str] | None:
    """Order-invariant value digest for results too wide to
    materialize in the driver (the sf1 sweep's >2M-row queries,
    VERDICT r7 item 3): both engines canonicalize every column to a
    deterministic string, md5 each row, keep 60 bits, and SUM them —
    a commutative fold, so row order never matters and neither side
    collects anything. Returns ``(spark_select, duckdb_select)``
    aggregate select-lists producing one ``(n_rows, digest)`` row, or
    ``None`` when a column type has no cross-engine canonical form
    (the caller falls back to count-only and says why).

    Canonical forms (cross-engine bit-identical):
    - integers/dates: plain decimal / ISO text casts.
    - doubles: ``floor(v·1e6 + 0.5)`` — both engines do the same
      IEEE multiply+floor on the same double, so equality holds
      regardless of the value's magnitude; NaN maps to 'nan'.
      (round() is avoided: its half-up/half-even tie rules differ.)
    - timestamps: explicit fixed-width microsecond formatting
      (engine-default casts disagree on trailing fraction zeros).
    - NULL: a sentinel outside the md5 alphabet.
    """
    spark_cols, duck_cols = [], []
    for f in sorted(schema.fields, key=lambda f: f.name):
        t = f.dataType.simpleString()
        c_s, c_d = f"`{f.name}`", f'"{f.name}"'
        if t in ("tinyint", "smallint", "int", "bigint"):
            s, d = f"CAST({c_s} AS STRING)", f"CAST({c_d} AS VARCHAR)"
        elif t in ("double", "float"):
            # three magnitude bands, all pure IEEE ops + integer
            # casts (identical cross-engine): micro-scaled below
            # 9e12 (where *1e6 fits int64), unit floor below 9e18
            # (double spacing > 1 there anyway), sign bucket beyond
            # (covers ±inf) — without the bands, DuckDB's overflow
            # cast ERRORS while Spark's saturates, a silent
            # cross-engine divergence on extreme values
            def _canon_double(col: str, cast: str) -> str:
                v = f"CAST({col} AS DOUBLE)"
                return (
                    f"CASE WHEN isnan({v}) THEN 'nan' "
                    f"WHEN abs({v}) < 9.0e12 THEN "
                    f"CAST(CAST(floor({v} * 1e6 + 0.5) AS BIGINT) AS {cast}) "
                    f"WHEN abs({v}) < 9.0e18 THEN "
                    f"'g' || CAST(CAST(floor({v}) AS BIGINT) AS {cast}) "
                    f"WHEN {v} > 0 THEN 'huge+' ELSE 'huge-' END"
                )

            s = _canon_double(c_s, "STRING")
            d = _canon_double(c_d, "VARCHAR")
        elif t == "string":
            s, d = c_s, c_d
        elif t == "boolean":
            s = f"CAST(CAST({c_s} AS INT) AS STRING)"
            d = f"CAST(CAST({c_d} AS INT) AS VARCHAR)"
        elif t == "date":
            s, d = f"CAST({c_s} AS STRING)", f"CAST({c_d} AS VARCHAR)"
        elif t in ("timestamp", "timestamp_ntz"):
            s = f"date_format({c_s}, 'yyyy-MM-dd HH:mm:ss.SSSSSS')"
            d = f"strftime({c_d}, '%Y-%m-%d %H:%M:%S.%f')"
        else:
            return None  # arrays/structs/decimals: no canonical form yet
        spark_cols.append(f"coalesce({s}, '~N~')")
        duck_cols.append(f"coalesce({d}, '~N~')")
    row_s = f"concat_ws('|', {', '.join(spark_cols)})"
    row_d = f"concat_ws('|', {', '.join(duck_cols)})"
    h_s = f"CAST(conv(substring(md5({row_s}), 1, 15), 16, 10) AS BIGINT)"
    h_d = f"CAST(('0x' || substring(md5({row_d}), 1, 15)) AS BIGINT)"
    sel_s = (
        f"count(*) AS n_rows, coalesce(CAST(CAST(sum(CAST({h_s} AS "
        f"DECIMAL(38,0))) % {DIGEST_MOD} AS BIGINT) AS STRING), '0') AS digest"
    )
    sel_d = (
        f"count(*) AS n_rows, coalesce(CAST(CAST(sum(CAST({h_d} AS "
        f"HUGEINT)) % {DIGEST_MOD} AS BIGINT) AS VARCHAR), '0') AS digest"
    )
    return sel_s, sel_d


def compare_query(
    name: str, spark, sf_dir: str, fn, oracle: str, strict: bool = True
) -> CompareResult:
    sdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(oracle).fetchdf()
    finally:
        con.close()

    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False,
            f"schema mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
            len(sdf), len(odf),
        )
    if len(sdf) != len(odf):
        return CompareResult(name, False, f"row count {len(sdf)} != {len(odf)}", len(sdf), len(odf))

    if strict:
        for col in sorted(sdf.columns):
            sk, ok_ = _dtype_kind(sdf[col]), _dtype_kind(odf[col])
            if sk != ok_:
                return CompareResult(
                    name, False,
                    f"dtype mismatch col {col}: spark={sdf[col].dtype} ({sk}) "
                    f"!= oracle={odf[col].dtype} ({ok_})",
                    len(sdf), len(odf),
                )

    s, o = _canon(sdf), _canon(odf)
    for col in s.columns:
        if _col_equal_vectorized(s[col], o[col], strict):
            continue
        # mismatch (or un-vectorizable dtype): fall through to the
        # row-by-row loop for the exact row/value in the message
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a_nan = a is None or (isinstance(a, float) and math.isnan(a))
            b_nan = b is None or (isinstance(b, float) and math.isnan(b))
            if a_nan and b_nan:
                continue
            if a_nan != b_nan or not _values_equal(a, b, strict):
                return CompareResult(
                    name, False, f"value mismatch at row {i} col {col}: {a!r} != {b!r}",
                    len(sdf), len(odf),
                )
    return CompareResult(name, True, "ok", len(sdf), len(odf))
