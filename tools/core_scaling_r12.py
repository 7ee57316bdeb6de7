#!/usr/bin/env python
"""Matched-window core-scaling measurement (VERDICT r11 item 5).

The r11 scaling block was confounded: the c8 record ran in a quiet
window and the c32 record in a loaded one, so 43/56 ratios read ≤1.1
and three read "faster on fewer cores". This tool removes the window
confound by running, PER QUERY, the 32-core child and the 8-core
child back-to-back (adjacent fresh processes sample the same machine
state), at sf1 (sf0.1 walls are fixed-cost floors — nothing to
scale). Each child is bench.py's own --one entry (same warm-up,
best-of-n, noop sink), so the numbers are protocol-identical to the
round records.

Usage: python tools/core_scaling_r12.py <sf_dir> <out.jsonl> [runs]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

# The 15 heaviest headline queries at sf1 (r12 family trend +
# opening baseline ordering).
QUERIES = [
    # compute-heavy at sf1 (should scale with cores):
    "dedup_jaccard_prefix",
    "dedup_ngram_jaccard",
    "dedup_simhash_hamming",
    "dedup_minhash_lsh",
    "sim_lsh_multiprobe",
    "sim_lsh_multiprobe_bounded",
    "sink_lsh_index",
    "text_decontaminate_bloom",
    "curation_pipeline",
    # fixed-floor representative (expected ~1 ratio, named as such):
    "streaming_submission_h5",
]


def child(name: str, sf_dir: str, cpus: int, runs: int) -> dict:
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_RUNS": str(runs),
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--one", name],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1]
    out = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    with open(out, "a") as f:
        for name in QUERIES:
            row = {"query": name, "sf_dir": sf_dir}
            for cpus in (32, 8):  # back-to-back: same machine window
                try:
                    rec = child(name, sf_dir, cpus, runs)
                    row[f"c{cpus}"] = {
                        "samples": rec[name],
                        "best": min(rec[name]),
                        "child_canary_cpu": rec.get("_attrib", {}).get(
                            "child_canary_cpu"
                        ),
                        "warmup": rec.get("_attrib", {}).get("warmup"),
                    }
                except Exception as e:  # noqa: BLE001
                    row[f"c{cpus}"] = {"error": f"{type(e).__name__}: {e}"}
            b32 = row.get("c32", {}).get("best")
            b8 = row.get("c8", {}).get("best")
            if b32 and b8:
                row["ratio_8c_over_32c"] = round(b8 / b32, 2)
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
