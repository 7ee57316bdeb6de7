#!/usr/bin/env python
"""Stage decomposition of sink_lsh_index's decade ratio (VERDICT r9
item 4, the SCALING.md §7c protocol): one fresh JVM per SF, timing
the lifecycle's three cost terms SEPARATELY —

  sig    the banded-MinHash signature pipeline over the stored
         corpus, forced with a noop write (narrow projection;
         should scale ~linearly with rows)
  write  the (band_idx, shard)-partitioned parquet write of those
         rows (repartition + 64-directory commit; file COUNT is
         constant by construction — 4 bands x 16 shards — so growth
         here is bytes, not files)
  probe  the new-batch path against the ALREADY-WRITTEN lake:
         probe signature, bounded shard collect, pruned equi join,
         pair distinct (probe side is ~50 docs at every SF)

    python tools/lsh_index_decompose.py \
        --sf-dirs /tmp/w4c_sf1,/tmp/w4c_sf10 --runs 3 \
        --out tools/lsh_index_decompose_r10.jsonl

Rows record all samples + best-of-n per stage; stages are timed in
lifecycle order within one session (sig's cache-free re-run cost is
what the query pays — the write re-derives it, which is the
lifecycle's real shape and is measured under `write` inclusive, with
`write_minus_sig` the derived isolated term).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _child(sf_dir: str, runs: int) -> None:
    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.operators import dedup
    from weather4cast_bigdata_spark.plans.registry import scratch_dir
    from weather4cast_bigdata_spark.session import get_spark
    from weather4cast_bigdata_spark.sources.catalog import load_table

    spark = get_spark("w4c-lsh-decompose")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def banded_of(side):
        sig = dedup.minhash_signatures_docs(side)
        return dedup.banded_signatures(sig).withColumn(
            "shard", F.pmod(F.xxhash64("band_key"), F.lit(16))
        )

    docs = load_table(spark, sf_dir, "documents")
    stored = docs.where(F.col("doc_id") >= 50)
    out = scratch_dir("w4c_lsh_decomp")

    stages: dict[str, list[float]] = {"sig": [], "write": [], "probe": []}
    for _ in range(runs):
        t0 = time.perf_counter()
        force(banded_of(stored))
        stages["sig"].append(round(time.perf_counter() - t0, 2))

        t0 = time.perf_counter()
        (
            banded_of(stored)
            .repartition("band_idx", "shard")
            .write.mode("overwrite")
            .partitionBy("band_idx", "shard")
            .parquet(out)
        )
        stages["write"].append(round(time.perf_counter() - t0, 2))

        lake = spark.read.parquet(out)
        t0 = time.perf_counter()
        probe = banded_of(docs.where(F.col("doc_id") < 50))
        probe_shards = sorted(
            r[0] for r in probe.select("shard").distinct().collect()
        )
        pruned = lake.where(F.col("shard").isin(probe_shards))
        force(
            probe.alias("p")
            .join(pruned.alias("i"), on=["band_idx", "shard", "band_key"])
            .select(
                F.col("p.doc_id").alias("id_a"),
                F.col("i.doc_id").alias("id_b"),
            )
            .distinct()
        )
        stages["probe"].append(round(time.perf_counter() - t0, 2))

    n_files = sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(out)
    )
    best = {k: min(v) for k, v in stages.items()}
    print(json.dumps({
        "sf": sf_dir,
        "samples": stages,
        "best": best,
        "write_minus_sig": round(best["write"] - best["sig"], 2),
        "lake_files": n_files,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default="")
    ap.add_argument("--one", default="")
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()

    if args.one:
        _child(args.one, args.runs)
        return

    sink = open(args.out, "a") if args.out else sys.stdout
    here = os.path.abspath(__file__)
    for sf_dir in args.sf_dirs.split(","):
        proc = None
        try:
            proc = subprocess.run(
                [sys.executable, here, "--one", sf_dir,
                 "--sf-dirs", "x", "--runs", str(args.runs)],
                capture_output=True, text=True, timeout=args.timeout,
            )
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            row = json.loads(line) if line.startswith("{") else {}
        except subprocess.TimeoutExpired:
            row = {}
        if not row:
            rc = proc.returncode if proc is not None else "timeout"
            tail = proc.stderr[-300:] if proc is not None and proc.stderr else ""
            row = {"sf": sf_dir, "error": f"child failed rc={rc}",
                   "stderr_tail": tail}
        print(json.dumps(row), file=sink, flush=True)
        print(json.dumps(row), file=sys.stderr, flush=True)
    if sink is not sys.stdout:
        sink.close()


if __name__ == "__main__":
    main()
