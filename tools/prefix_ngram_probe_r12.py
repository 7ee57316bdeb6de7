#!/usr/bin/env python
"""r12 measurements for VERDICT items 4 and 6 (one session, interleaved).

Item 4 — dedup_jaccard_prefix verify tail: decompose the sf1 wall
into candidate-stage vs verify-tail by timing the committed operator
against a tail-less copy (same module source with the verify joins
replaced by the bare candidate projection), then time the verify in
isolation over the PERSISTED candidate set.

Item 6 — dedup_ngram bucket-collect: A/B the committed
collect_list-per-shingle enumeration against the salted two-sided
equi-join alternative (the prefix operator's split_bucket form,
applied wholesale) — same pair multiset, measured end-to-end on the
jaccard query shape.

Usage: python tools/prefix_ngram_probe_r12.py <sf_dir> [rounds]
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from weather4cast_bigdata_spark.session import get_spark  # noqa: E402
from weather4cast_bigdata_spark.operators import dedup  # noqa: E402
from weather4cast_bigdata_spark.functions.text import (  # noqa: E402
    md5_hash32,
    tokens,
    word_shingles,
)
from weather4cast_bigdata_spark.partitioning import (  # noqa: E402
    ensure_min_parallelism,
)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def emit(**kw):
    print(json.dumps(kw), flush=True)


def load_tailless_dedup():
    """Module copy whose prefix_filtered_jaccard_pairs stops at the
    bare candidate (id_a, id_b) projection — the committed source
    with ONLY the verify tail replaced, so the candidate stage is
    timed on identical code."""
    import importlib.util

    src = open(os.path.join(REPO, "weather4cast_bigdata_spark/operators/dedup.py")).read()
    tail_start = src.index('    a = base.select(F.col(id_col).alias("id_a")')
    tail_end = src.index("def connected_components")
    assert "prefix_filtered_jaccard_pairs" in src[:tail_start]
    patched = src[:tail_start] + "    return cand\n\n\n" + src[tail_end - 0:]
    path = "/tmp/dedup_tailless_r12.py"
    with open(path, "w") as f:
        f.write(patched)
    spec = importlib.util.spec_from_file_location("dedup_tailless_r12", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def salted_ngram_jaccard(docs, id_col="doc_id", text_col="text", n=3,
                         max_df=None, threshold=0.5, n_salt=8):
    """Item-6 alternative: salted two-sided equi self-join pair
    enumeration (side A once at its own salt, side B replicated
    across all salts) instead of the bucket-collect explode. Same
    (id_a, id_b) multiset per shared shingle; max_df applied as the
    same bucket-size screen via a census join."""
    sing = dedup.doc_shingle_hashes(docs, id_col, text_col, n)
    sizes = sing.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    sing = sing.join(sizes, id_col)
    if max_df is not None:
        census = sing.groupBy("h32").agg(F.count(F.lit(1)).alias("_df"))
        sing = sing.join(
            census.where(F.col("_df") <= max_df).select("h32"), "h32"
        )
    a = sing.select(
        F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"), "h32",
        F.pmod(F.xxhash64(id_col), F.lit(n_salt)).alias("_s"),
    )
    b = sing.select(
        F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"), "h32",
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("_s"),
    )
    inter = (
        a.join(b, ["h32", "_s"])
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return inter.withColumn(
        "jaccard",
        F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
    ).where(F.col("jaccard") >= F.lit(threshold)).select(
        "id_a", "id_b", F.round(F.col("jaccard") + F.lit(1e-9), 6).alias("jaccard")
    )


def main():
    sf_dir = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("pref-ngram-r12")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tailless = load_tailless_dedup()

    # ---- item 4: prefix-jaccard decomposition ----
    for rnd in range(rounds):
        q_full = dedup.prefix_filtered_jaccard_pairs(docs)
        spark.sparkContext.setJobDescription(f"prefix full r{rnd}")
        t0 = time.perf_counter(); noop(q_full)
        t_full = time.perf_counter() - t0
        q_cand = tailless.prefix_filtered_jaccard_pairs(docs)
        spark.sparkContext.setJobDescription(f"prefix cand-only r{rnd}")
        t0 = time.perf_counter(); noop(q_cand)
        t_cand = time.perf_counter() - t0
        emit(probe="prefix_decomp", rnd=rnd, full_sec=round(t_full, 2),
             cand_sec=round(t_cand, 2), verify_sec=round(t_full - t_cand, 2))

    # verify-tail in isolation over a persisted candidate set: the
    # exact committed expression vs a float-free variant statement
    cand = tailless.prefix_filtered_jaccard_pairs(docs).persist()
    n_cand = cand.count()
    sh = word_shingles(tokens(F.col("text")), 3)
    base = (
        ensure_min_parallelism(docs)
        .select(F.col("doc_id"),
                F.array_distinct(F.transform(sh, md5_hash32)).alias("_hs"))
        .where(F.size("_hs") > 0)
        .persist()
    )
    base.count()
    a = base.select(F.col("doc_id").alias("id_a"), F.col("_hs").alias("_hs_a"))
    b = base.select(F.col("doc_id").alias("id_b"), F.col("_hs").alias("_hs_b"))
    inter = F.size(F.array_intersect("_hs_a", "_hs_b"))
    verify = (
        cand.join(a, "id_a").join(b, "id_b")
        .withColumn("inter", inter)
        .withColumn("jaccard", F.col("inter") / (F.size("_hs_a") + F.size("_hs_b") - F.col("inter")))
        .where(F.col("jaccard") >= F.lit(0.5))
    )
    for rnd in range(rounds):
        spark.sparkContext.setJobDescription(f"verify isolated r{rnd}")
        t0 = time.perf_counter(); noop(verify)
        emit(probe="verify_isolated", rnd=rnd, n_cand=n_cand,
             sec=round(time.perf_counter() - t0, 2))
    cand.unpersist(); base.unpersist()

    # ---- item 6: ngram bucket-collect vs salted two-stage ----
    from weather4cast_bigdata_spark.plans.registry import REGISTRY
    q_committed = lambda: REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir)  # noqa: E731
    # mirror the registry's params for the alternative
    import inspect
    regsrc = inspect.getsource(REGISTRY["dedup_ngram_jaccard"].fn)
    emit(probe="ngram_registry_source_tail", src=regsrc.strip().splitlines()[-1])
    alt = lambda: salted_ngram_jaccard(docs, max_df=256, threshold=0.5)  # noqa: E731
    # identity first
    got_a = q_committed()
    got_b = alt().select(*[c for c in got_a.columns])
    diff = got_a.exceptAll(got_b).count() + got_b.exceptAll(got_a).count()
    emit(probe="ngram_identity", mismatches=diff, rows=got_a.count())
    for rnd in range(rounds):
        for label, q in (("bucket_collect", q_committed), ("salted_join", alt)):
            spark.sparkContext.setJobDescription(f"ngram {label} r{rnd}")
            t0 = time.perf_counter(); noop(q())
            emit(probe="ab_ngram", variant=label, rnd=rnd,
                 sec=round(time.perf_counter() - t0, 2))


if __name__ == "__main__":
    main()
