"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship evaluate-analog plan at sf0.001;
``queries()`` exposes every implemented SURVEY.md §2 operator;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible operator (the driver's correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather4cast_bigdata_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from weather4cast_bigdata_spark.plans.flagship import flagship_evaluate

    return flagship_evaluate(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
