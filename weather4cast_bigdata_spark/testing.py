"""Local replica of the driver's correctness gate: run a registry
query on Spark and its oracle SQL on DuckDB, compare row count,
column names, and (order-insensitively) values.

Used by tests/ so every operator is verified the same way the driver
verifies it (CORRECTNESS_r{N}.json).
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


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b, tol=1e-9) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= tol * max(1.0, abs(fa), abs(fb))
    return a == b


def compare_query(name: str, spark, sf_dir: str, fn, oracle: str) -> CompareResult:
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

    s, o = _canon(sdf), _canon(odf)
    for col in s.columns:
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            a_nan = a is None or (isinstance(a, float) and math.isnan(a))
            b_nan = b is None or (isinstance(b, float) and math.isnan(b))
            if a_nan and b_nan:
                continue
            if a_nan != b_nan or not _values_equal(a, b):
                return CompareResult(
                    name, False, f"value mismatch at row {i} col {col}: {a!r} != {b!r}",
                    len(sdf), len(odf),
                )
    return CompareResult(name, True, "ok", len(sdf), len(odf))
