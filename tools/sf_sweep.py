#!/usr/bin/env python
"""Full oracle sweep of every `__spark_entry__.queries()` entry at an
arbitrary scale factor — the protocol behind the sf1 rows in
BASELINE.md / SCALING.md §6 (VERDICT r5 item 1).

    python tools/gen_sf_scale.py --copies 10 --out /tmp/w4c_sf1
    python tools/sf_sweep.py --sf-dir /tmp/w4c_sf1 --out /tmp/sf1.jsonl

Modes per query (one JSONL row each):
- hash: the driver's dtype-strict compare (rows + schema + value
  hash) against DuckDB running the same oracle SQL on the same lake.
- digest-at-sf1: results wider than ``--max-compare-rows`` (e.g.
  join_interval_overlap emits 51.7M rows at sf1) compare row count
  PLUS an order-invariant value digest (sum of per-row 60-bit md5
  hashes over canonicalized columns, computed in-engine on BOTH
  sides — testing.digest_exprs) instead of materializing either
  result set in the driver.
- count-only-at-sf1: digest fallback when a column type has no
  cross-engine canonical form (arrays/structs); the row records the
  reason.
- rows-only: queries with no oracle (RNG order / sketch internals /
  iterative training); each has a hash-verified sibling in the
  registry.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", default="")
    ap.add_argument("--max-compare-rows", type=int, default=2_000_000)
    ap.add_argument("--only", default="", help="comma list of query names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "96g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from weather4cast_bigdata_spark.testing import compare_query, duckdb_conn

    qs, os_ = e.queries(), e.oracle_sql()
    names = sorted(args.only.split(",")) if args.only else sorted(qs)
    sink = open(args.out, "w") if args.out else sys.stdout

    def emit(row: dict) -> None:
        print(json.dumps(row), file=sink, flush=True)

    fails = errs = 0
    for name in names:
        fn, t0 = qs[name], time.time()
        try:
            if name not in os_:
                emit({"q": name, "mode": "rows-only", "rows": fn(spark, args.sf_dir).count(),
                      "sec": round(time.time() - t0, 2)})
                continue
            n = fn(spark, args.sf_dir).count()
            if n > args.max_compare_rows:
                from weather4cast_bigdata_spark.testing import digest_exprs

                sdf = fn(spark, args.sf_dir)
                exprs = digest_exprs(sdf.schema)
                con = duckdb_conn(args.sf_dir)
                try:
                    if exprs is None:
                        # no cross-engine canonical form for a column
                        # type: weakest check, and the row says so
                        on = con.execute(
                            f"SELECT count(*) FROM ({os_[name]})"
                        ).fetchone()[0]
                        ok = n == int(on)
                        fails += 0 if ok else 1
                        emit({"q": name, "mode": "count-only-at-sf1", "ok": ok,
                              "rows": n, "oracle_rows": int(on),
                              "reason": "column type without canonical digest form",
                              "sec": round(time.time() - t0, 2)})
                        continue
                    sel_s, sel_d = exprs
                    sdf.createOrReplaceTempView("_digest_in")
                    srow = spark.sql(f"SELECT {sel_s} FROM _digest_in").collect()[0]
                    orow = con.execute(
                        f"SELECT {sel_d} FROM ({os_[name]})"
                    ).fetchone()
                finally:
                    con.close()
                ok = int(srow[0]) == int(orow[0]) and str(srow[1]) == str(orow[1])
                fails += 0 if ok else 1
                emit({"q": name, "mode": "digest-at-sf1", "ok": ok, "rows": n,
                      "oracle_rows": int(orow[0]), "digest": str(srow[1]),
                      "oracle_digest": str(orow[1]),
                      "sec": round(time.time() - t0, 2)})
                continue
            r = compare_query(name, spark, args.sf_dir, fn, os_[name])
            fails += 0 if r.ok else 1
            emit({"q": name, "ok": r.ok, "rows": r.spark_rows,
                  "sec": round(time.time() - t0, 2), "detail": None if r.ok else r.detail})
        except Exception as ex:  # keep sweeping; a crash is a row, not an abort
            errs += 1
            emit({"q": name, "error": f"{type(ex).__name__}: {ex}"[:300],
                  "sec": round(time.time() - t0, 2)})
            traceback.print_exc(file=sys.stderr)
    print(f"SUMMARY fails={fails} errors={errs}", file=sys.stderr, flush=True)
    if sink is not sys.stdout:
        sink.close()
    sys.exit(1 if (fails or errs) else 0)


if __name__ == "__main__":
    main()
