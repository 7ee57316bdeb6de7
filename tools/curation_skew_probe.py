#!/usr/bin/env python
"""curation_pipeline's CC label join-back under a CLONE-HEAVY lake
(VERDICT r9 item 7): at web scale, near-dup rates of 30-50% make the
component-label table corpus-sized, and SCALING.md names the
unhinted doc_id join-back as the one stage AQE must get right —
broadcast when comp is small, sort-merge (NOT a forced broadcast,
which would OOM) when it is not.

This probe builds the adversarial case at sf10 volume: every doc in
a NEAR-clone cluster (copies share all but the tail token, so the
EXACT-dedup stage cannot remove them — unlike the verbatim DUP lake
— and the label table really is ~90% of the corpus), runs the full
`curate()` flagship, and reports (a) wall time, (b) which physical
join the final adaptive plan chose for the label join-back, and
(c) the comp/corpus ratio that drove the choice. A GROWTH-lake run
(near-dup rate at the synthetic base rate, comp small) is the
contrast row.

    python tools/curation_skew_probe.py \
        --base /tmp/w4c_sf1 --copies 10 \
        --lake /tmp/w4c_neardup10 --out tools/curation_skew_r10.jsonl

The structural pin lives in tests/test_plan_shape.py
(test_curation_label_joinback_plan): no broadcast HINT on comp, SMJ
when broadcast is impossible, AQE broadcast when comp measures
small.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_neardup_lake(spark, base_dir: str, copies: int, lake: str) -> None:
    """copies x near-clone variants of the base documents: copy i
    keeps the text verbatim and appends one tail token ``zzdup{i}``
    — shingle overlap stays near-total (Jaccard >> 0.5) while the
    md5(text) exact hash differs, so every doc lands in a
    ``copies``-sized near-dup cluster that only the NEAR-dup stage
    can collapse."""
    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.sources.catalog import load_table

    docs = load_table(spark, base_dir, "documents").select("doc_id", "text")
    parts = []
    for i in range(copies):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" zzdup{i}")).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(32).write.mode("overwrite").parquet(f"{lake}/documents.parquet")


def probe(spark, lake: str, label: str) -> dict:
    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.plans.curation import curate
    from weather4cast_bigdata_spark.sources.catalog import load_table

    docs = load_table(spark, lake, "documents").select("doc_id", "text")
    n_docs = docs.count()

    t0 = time.perf_counter()
    result = curate(docs)
    result.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    survivors = result.count()

    # rebuild the label join-back in isolation to read its FINAL
    # adaptive plan (the full pipeline plan buries it); same code
    # path as plans/curation.curate
    from pyspark.sql import Window

    from weather4cast_bigdata_spark.functions.text import quality_score
    from weather4cast_bigdata_spark.operators import dedup

    scored = docs.withColumn(
        "quality", F.round(quality_score(F.col("text")) + F.lit(1e-9), 6)
    ).where(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    exact = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    pairs = dedup.ngram_jaccard_pairs_docs(
        exact, threshold=0.5, max_df=dedup.NGRAM_MAX_DF
    )
    comp = dedup.connected_components(pairs).withColumnRenamed("id", "doc_id")
    n_comp = comp.count()
    # the SAME count gate plans/curation.curate applies (r10): the
    # checkpointed comp has no size stats, so broadcast-vs-SMJ is a
    # measured decision, not an estimator one
    from weather4cast_bigdata_spark.plans.curation import (
        BROADCAST_LABELS_MAX_ROWS,
    )

    comp_side = (
        F.broadcast(comp) if n_comp <= BROADCAST_LABELS_MAX_ROWS else comp
    )
    joined = exact.join(comp_side, on="doc_id", how="left")
    joined.write.format("noop").mode("overwrite").save()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_kind = (
        "broadcast" if "BroadcastHashJoin" in plan
        else "sort-merge" if "SortMergeJoin" in plan
        else "shuffled-hash" if "ShuffledHashJoin" in plan
        else "other"
    )
    return {
        "lake": label,
        "n_docs": n_docs,
        "curate_wall_sec": wall,
        "survivors": survivors,
        "comp_rows": n_comp,
        "comp_ratio": round(n_comp / max(n_docs, 1), 3),
        "label_joinback": join_kind,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/w4c_sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--lake", default="/tmp/w4c_neardup10")
    ap.add_argument("--growth", default="/tmp/w4c_sf10",
                    help="contrast lake (low near-dup rate)")
    ap.add_argument("--out", default="")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()

    from weather4cast_bigdata_spark.session import get_spark

    spark = get_spark("w4c-curation-skew")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.skip_build:
        build_neardup_lake(spark, args.base, args.copies, args.lake)

    rows = [
        probe(spark, args.lake, f"neardup x{args.copies} (clone-heavy)"),
        probe(spark, args.growth, "growth (base near-dup rate)"),
    ]
    # corpus-sized-comp regime on the same clone-heavy lake: force
    # the gate closed to measure the SMJ path the 30-50%-dup web
    # corpus would take
    from weather4cast_bigdata_spark.plans import curation

    saved = curation.BROADCAST_LABELS_MAX_ROWS
    try:
        curation.BROADCAST_LABELS_MAX_ROWS = -1
        rows.append(
            probe(
                spark, args.lake,
                f"neardup x{args.copies} (gate forced closed -> SMJ)",
            )
        )
    finally:
        curation.BROADCAST_LABELS_MAX_ROWS = saved
    sink = open(args.out, "a") if args.out else sys.stdout
    for row in rows:
        print(json.dumps(row), file=sink, flush=True)
        print(json.dumps(row), file=sys.stderr, flush=True)
    if sink is not sys.stdout:
        sink.close()


if __name__ == "__main__":
    main()
