#!/usr/bin/env python
"""r12 stage probe + interleaved A/B for the multiprobe-family
candidate join+distinct (VERDICT r11 item 1).

Decomposes `sim_lsh_multiprobe_bounded` (and the unbounded sibling)
at a given lake into:
  - meeting volume (join output, pre-distinct) and its components:
    exact-key meetings, duplicate ext-flip meetings (merged rows
    probe their own bucket twice: fractional_key_parts zeroes the
    ext term for merged prefixes, so `keyed(prefix, 1-ext)` ==
    `hpk`), and flip meetings;
  - candidate-stage wall (noop on cand) vs full-query wall;
then A/Bs OLD (HEAD) vs NEW (working tree) implementations
interleaved in one session, and full-outer-compares the pair sets.

Usage: python tools/mp_stage_probe_r12.py <sf_dir> [n_rounds]
Emits one JSON line per measurement to stdout.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from weather4cast_bigdata_spark.session import get_spark  # noqa: E402
from weather4cast_bigdata_spark.operators import similarity  # noqa: E402


def load_old_similarity(ref: str = "HEAD"):
    """Import the committed similarity.py under a private name so old
    and new forms can alternate inside ONE session (the r11 interleaved
    protocol — cross-session raw comparison is a window artifact)."""
    import importlib.util

    src = subprocess.run(
        ["git", "show", f"{ref}:weather4cast_bigdata_spark/operators/similarity.py"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    path = "/tmp/similarity_old_r12.py"
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location("similarity_old_r12", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def emit(**kw):
    print(json.dumps(kw), flush=True)


def bounded_query(mod, spark, sf_dir):
    import inspect

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    p, r = mod.fractional_split(n, target_bucket=8)
    signs = mod.hyperplane_signs(p + (1 if r else 0), 64)
    kw = {}
    if "n_rows" in inspect.signature(
        mod.near_dup_pairs_multiprobe_bounded
    ).parameters:  # mirrors the registry call; old HEADs lack the kwarg
        kw["n_rows"] = n
    return (
        mod.near_dup_pairs_multiprobe_bounded(
            emb, signs, prefix_planes=p, split_r=r, threshold=0.2,
            n_probes=8, **kw,
        ),
        (emb, n, p, r, signs),
    )


def unbounded_query(mod, spark, sf_dir, params):
    emb, n, p, r, signs = params
    return mod.near_dup_pairs_multiprobe(
        emb, signs, prefix_planes=p, split_r=r, threshold=0.2, n_rows=n
    )


def meeting_decomposition(spark, sf_dir, params):
    """Meeting volume of the bounded rule, decomposed by probe class
    — replicates the operator's candidate internals (same exprs)."""
    emb, n, p, r, signs = params
    sp = similarity.hyperplane_bucket_probe_arrow(F.col("embedding"), signs, p, 8)
    b = emb.select(
        F.col("vec_id"), sp.alias("_sp")
    ).select(
        "vec_id",
        F.col("_sp.hp").alias("hp"),
        F.col("_sp.probe_mask").alias("pm"),
        similarity.fractional_key(F.col("_sp.hp"), p, r).alias("hpk"),
    ).persist()
    hot = (
        b.groupBy("hpk").agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > 4096).select("hpk")
    )
    b2 = b.join(F.broadcast(hot), on="hpk", how="left_anti")
    prefix = F.col("hp").bitwiseAND(F.lit((1 << p) - 1).cast("bigint"))
    ext = F.shiftright(F.col("hp"), p).bitwiseAND(F.lit(1).cast("bigint"))
    keyed = lambda pref, e: similarity.fractional_key_parts(pref, e, r)  # noqa: E731
    merged = (prefix % 4) >= F.lit(r)

    def probes(classes):
        arr = []
        if "exact" in classes:
            arr.append(F.struct(F.col("hpk").alias("k"), F.lit(True).alias("keep")))
        if "extflip" in classes:
            arr.append(F.struct(
                keyed(prefix, F.lit(1).cast("bigint") - ext).alias("k"),
                F.lit(True).alias("keep")))
        if "extflip_unmerged" in classes:
            arr.append(F.struct(
                keyed(prefix, F.lit(1).cast("bigint") - ext).alias("k"),
                (~merged).alias("keep")))
        if "flips" in classes:
            arr += [
                F.struct(
                    keyed(prefix.bitwiseXOR(F.lit(1 << i).cast("bigint")), ext).alias("k"),
                    (F.shiftright(F.col("pm"), i).bitwiseAND(F.lit(1)) == 1).alias("keep"))
                for i in range(p)
            ]
        pr = b2.select(
            F.col("vec_id"),
            F.explode(F.filter(F.array(*arr), lambda s: s["keep"])).alias("pr"),
        ).select("vec_id", F.col("pr.k").alias("probe"))
        ex = b2.select(F.col("vec_id").alias("item_id"), F.col("hpk").alias("probe"))
        return pr.join(ex, on="probe").where(F.col("vec_id") != F.col("item_id"))

    out = {
        "n": n, "p": p, "r": r,
        "meetings_old_total": probes(["exact", "extflip", "flips"]).count(),
        "meetings_new_total": probes(["exact", "extflip_unmerged", "flips"]).count(),
        "meetings_exact": probes(["exact"]).count(),
        "meetings_flips": probes(["flips"]).count(),
        "merged_rows": b2.where(merged).count(),
        "distinct_pairs": probes(["exact", "extflip", "flips"])
            .select(F.least("vec_id", "item_id"), F.greatest("vec_id", "item_id"))
            .distinct().count(),
    }
    b.unpersist()
    return out


def main():
    sf_dir = sys.argv[1]
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("mp-probe-r12")
    spark.sparkContext.setLogLevel("ERROR")
    old = load_old_similarity()

    qnew, params = bounded_query(similarity, spark, sf_dir)
    qold, _ = bounded_query(old, spark, sf_dir)

    spark.sparkContext.setJobDescription("mp_probe: meeting decomposition")
    emit(probe="meeting_decomposition", sf_dir=sf_dir,
         **meeting_decomposition(spark, sf_dir, params))

    # pair-set identity old vs new (bounded + unbounded)
    for name, a, bq in (
        ("bounded", qold, qnew),
        ("unbounded", unbounded_query(old, spark, sf_dir, params),
         unbounded_query(similarity, spark, sf_dir, params)),
    ):
        spark.sparkContext.setJobDescription(f"mp_probe: identity {name}")
        diff = a.exceptAll(bq).count() + bq.exceptAll(a).count()
        emit(probe="identity", variant=name, mismatches=diff, rows=a.count())

    # interleaved wall-clock A/B, full query, noop sink
    for rnd in range(n_rounds):
        for label, mod in (("old", old), ("new", similarity)):
            spark.sparkContext.setJobDescription(f"mp_probe: bounded {label} r{rnd}")
            q, _ = bounded_query(mod, spark, sf_dir)
            t0 = time.perf_counter()
            noop(q)
            emit(probe="ab_bounded", variant=label, rnd=rnd,
                 sec=round(time.perf_counter() - t0, 3))
        for label, mod in (("old", old), ("new", similarity)):
            spark.sparkContext.setJobDescription(f"mp_probe: unbounded {label} r{rnd}")
            q = unbounded_query(mod, spark, sf_dir, params)
            t0 = time.perf_counter()
            noop(q)
            emit(probe="ab_unbounded", variant=label, rnd=rnd,
                 sec=round(time.perf_counter() - t0, 3))


if __name__ == "__main__":
    main()
