#!/usr/bin/env python
"""Canary-normalized comparison of two bench records (VERDICT r5
item 2's second half: make cross-round deltas readable without
machine-drift caveats).

    python tools/bench_compare.py BENCH_LATEST.json BENCH_r07.json

Accepts either the compact driver line (queries + canary) or the full
BENCH_LATEST.json; also tolerates the r5-style truncated record
(recovers per-query minima from the "tail" fragment, no canary).

Per query it prints old, new, the raw ratio, and the NORMALIZED ratio
(raw divided by the canary-cpu ratio): normalized ~ 1.0 means the
delta is machine drift, not a code change; normalized meaningfully
below/above 1 survives load correction. The shuffle canary is shown
for context (shuffle-heavy queries track it better than the cpu one).
"""

from __future__ import annotations

import json
import re
import sys


def load(path: str) -> tuple[dict[str, float], dict[str, float]]:
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:  # driver capture with noise lines
        d = json.loads(raw.strip().splitlines()[-1])
    if "queries" in d:
        return dict(d["queries"]), dict(d.get("canary", {}))
    if "tail" in d:  # r5-style truncated record
        pairs = re.findall(r'"([a-z_0-9]+)": \[([0-9., ]+)\]', d["tail"])
        return (
            {k: min(float(x) for x in v.split(",")) for k, v in pairs},
            {},
        )
    raise SystemExit(f"{path}: no queries found")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old_q, old_c = load(sys.argv[1])
    new_q, new_c = load(sys.argv[2])
    drift = None
    if old_c.get("canary_cpu") and new_c.get("canary_cpu"):
        drift = new_c["canary_cpu"] / old_c["canary_cpu"]
        sh = (
            new_c["canary_shuffle"] / old_c["canary_shuffle"]
            if old_c.get("canary_shuffle") and new_c.get("canary_shuffle")
            else float("nan")
        )
        print(f"canary drift: cpu {drift:.2f}x  shuffle {sh:.2f}x")
    else:
        print("canary missing on one side: raw ratios only")
    common = sorted(set(old_q) & set(new_q), key=lambda q: -(new_q[q] / old_q[q]))
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'ratio':>6s} {'norm':>6s}")
    for q in common:
        r = new_q[q] / old_q[q]
        n = r / drift if drift else float("nan")
        print(f"{q:34s} {old_q[q]:7.2f} {new_q[q]:7.2f} {r:6.2f} {n:6.2f}")
    so, sn = sum(old_q[q] for q in common), sum(new_q[q] for q in common)
    tot = sn / so
    print(
        f"{'TOTAL (' + str(len(common)) + ' common)':34s} {so:7.1f} {sn:7.1f} "
        f"{tot:6.2f} {tot / drift if drift else float('nan'):6.2f}"
    )


if __name__ == "__main__":
    main()
