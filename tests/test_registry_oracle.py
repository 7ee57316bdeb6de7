"""The driver-gate replica: every registry query with an oracle must
hash-match DuckDB at sf0.001 (fast) — the driver does the same at
sf0.01."""

from __future__ import annotations

import pytest

from weather4cast_bigdata_spark.plans.registry import REGISTRY
from weather4cast_bigdata_spark.testing import compare_query

ORACLE_QUERIES = sorted(name for name, qd in REGISTRY.items() if qd.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    qd = REGISTRY[name]
    res = compare_query(name, spark, sf_dir, qd.fn, qd.oracle)
    assert res.ok, f"{name}: {res.detail} (spark={res.spark_rows} oracle={res.oracle_rows})"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())


ROWS_ONLY = sorted(name for name, qd in REGISTRY.items() if not qd.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    qd = REGISTRY[name]

    def snapshot():
        rows = qd.fn(spark, sf_dir).collect()
        return sorted(tuple(str(v) for v in r) for r in rows)

    first = snapshot()
    assert len(first) >= 0
    # determinism: every rows-only query (seeded sampling, streaming
    # replays, binary decode, driver solves) must reproduce its FULL
    # content run-to-run, not just its row count
    assert snapshot() == first
