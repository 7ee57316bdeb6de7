#!/usr/bin/env python
"""Snapshot `.explain("formatted")` for headline queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence an
optimization round commits next to its timing claims.

Usage:
    python tools/plan_snapshot.py <tag> <suffix> [query ...]

With no query list, snapshots the whole bench HEADLINE set. Plans are
captured with AQE disabled (same rationale as tools/explain_audit.py:
codegen ids and operator lists are hidden inside AdaptiveSparkPlan
before execution; static shape is what the snapshot pins) at
$SPARK_GRAFT_SF_DIR (default sf0.001 — plan shape, not timing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from weather4cast_bigdata_spark.plans.registry import REGISTRY  # noqa: E402
from weather4cast_bigdata_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("w4c-plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted) at {sf_dir}\n\n")
            f.write(plan_of(df).strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
