#!/usr/bin/env python
"""Fresh-process scale-trend timing: ONE JVM per (query, sf_dir) —
the protocol behind SCALING.md §7's decade tables (a pooled session
inflates later queries via unreclaimed shuffle state; measured up to
2.6×, §7 "session hygiene"). Each row records all samples (the first
is the cold/codegen run) and best-of-n, matching the r8 trend-row
format in tools/sf3_trend_r8.jsonl:

    python tools/scale_trend.py \
        --queries sim_hyperplane_lsh,sim_lsh_multiprobe \
        --sf-dirs /tmp/w4c_sf1,/tmp/w4c_sf10 \
        --runs 5 --out tools/sf10_trend_r9.jsonl

Timing only — the correctness side of the same rows comes from
tools/sf_sweep.py --only <query> --sf-dir <lake> (hash compare or
order-invariant value digest vs the DuckDB oracle), VERDICT r8
item 7.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _child(name: str, sf_dir: str, runs: int) -> None:
    from weather4cast_bigdata_spark.plans.registry import REGISTRY
    from weather4cast_bigdata_spark.session import get_spark

    spark = get_spark("w4c-trend-one")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        force(REGISTRY[name].fn(spark, sf_dir))
        ts.append(round(time.perf_counter() - t0, 2))
    print(json.dumps(
        {"query": name, "sf": sf_dir, "samples": ts, "best": min(ts)}
    ))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True, help="comma list")
    ap.add_argument("--sf-dirs", required=True, help="comma list")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--one", default="")  # child mode
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    if args.one:
        _child(args.one, args.sf_dirs, args.runs)
        return

    sink = open(args.out, "a") if args.out else sys.stdout
    here = os.path.abspath(__file__)
    for sf_dir in args.sf_dirs.split(","):
        for name in args.queries.split(","):
            # proc is rebound per iteration BEFORE the run call: a timeout
            # on the FIRST child previously raised NameError here, and a
            # timeout on a later child reported the PREVIOUS query's
            # returncode/stderr tail (ADVICE r9).
            proc = None
            try:
                proc = subprocess.run(
                    [sys.executable, here, "--one", name,
                     "--queries", "x", "--sf-dirs", sf_dir,
                     "--runs", str(args.runs)],
                    capture_output=True, text=True, timeout=args.timeout,
                )
                line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
                row = json.loads(line) if line.startswith("{") else {}
            except subprocess.TimeoutExpired:
                row = {}
            if not row:
                rc = proc.returncode if proc is not None else "timeout"
                tail = proc.stderr[-300:] if proc is not None and proc.stderr else ""
                row = {"query": name, "sf": sf_dir,
                       "error": f"child failed rc={rc}",
                       "stderr_tail": tail}
            print(json.dumps(row), file=sink, flush=True)
            print(json.dumps(row), file=sys.stderr, flush=True)
    if sink is not sys.stdout:
        sink.close()


if __name__ == "__main__":
    main()
