"""CLI mirroring the reference's entry points (``main.py:226-285``):

    python -m weather4cast_bigdata_spark ingest \
        --raw-dir /data/w4c-core-stage-1 --output-dir /lake/frames
    python -m weather4cast_bigdata_spark submit --submission-dir /tmp/out
    python -m weather4cast_bigdata_spark evaluate [--regions R1,R2]
    python -m weather4cast_bigdata_spark evaluate_ensemble \
        --ensemble-weights ridge|equal|ridge_lagrange
    python -m weather4cast_bigdata_spark curate --docs-dir /lake/documents.parquet
    python -m weather4cast_bigdata_spark audit --docs-dir /lake/documents.parquet
    python -m weather4cast_bigdata_spark decontaminate \
        --docs-dir /lake/documents.parquet --eval-dir /lake/benchmark.parquet
    python -m weather4cast_bigdata_spark pack \
        --docs-dir /lake/documents.parquet --capacity 2048
    python -m weather4cast_bigdata_spark sql \
        --lake-dir /lake --query "SELECT count(*) FROM documents"

The reference dispatches train/evaluate/submit over its NetCDF lake;
here the same modes run the Spark plans over a frame lake — by
default the bundled deterministic weather fixtures, or any Parquet
lake in the long layout via ``--frames-dir`` (produced by
``sources.netcdf.etl_to_parquet``). ``train``'s gradient loop is
model-internal (out of engine scope, SURVEY.md §2.8); its *data*
semantics (shuffle/crop/augment) are library operators, so the mode
prints a pointer instead of pretending.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F

from weather4cast_bigdata_spark.plans import weather
from weather4cast_bigdata_spark.session import get_spark
from weather4cast_bigdata_spark.sources import weather_fixtures


def _frames(spark, args):
    if args.frames_dir:
        fx = dict(weather_fixtures.load_fixtures(spark))
        fx["frames"] = spark.read.parquet(args.frames_dir)
        return fx
    return weather_fixtures.load_fixtures(spark)


def _region_filter(df, regions):
    return df.where(F.col("region").isin(regions)) if regions else df


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="weather4cast_bigdata_spark")
    p.add_argument(
        "mode",
        choices=[
            "ingest", "submit", "evaluate", "evaluate_ensemble", "train",
            "curate", "audit", "decontaminate", "pack", "sql",
        ],
    )
    p.add_argument("--raw-dir", default="", help="ingest: comp_dir root of the region/subset/day/product NetCDF tree (datasets.py:256-269 layout)")
    p.add_argument("--products", default="", help="ingest: PRODUCT=var1,var2;PRODUCT=... map (default: the reference's CTTH/CRR/ASII/CMA variables)")
    p.add_argument("--grid", default="8x8", help="ingest: frame grid HxW (fixtures 8x8; competition frames 256x256)")
    p.add_argument("--frames-dir", default="", help="Parquet frame lake (long layout); default: bundled fixtures")
    p.add_argument("--regions", default="", help="Comma-separated region whitelist")
    p.add_argument("--submission-dir", default="", help="submit: output path for the quantized partitioned sink")
    p.add_argument("--submission-format", default="parquet", choices=["parquet", "h5"], help="submit: parquet lake (default) or the scorer's per-(region,day) HDF5 files (pure-Python HDF5 writer when h5py is absent)")
    p.add_argument("--ensemble-weights", default="ridge", choices=["ridge", "equal", "ridge_lagrange"])
    p.add_argument("--docs-dir", default="", help="curate/audit/decontaminate/pack: documents parquet (doc_id, text, ...)")
    p.add_argument("--output-dir", default="", help="curate/decontaminate/pack: write results here (else print summary only)")
    p.add_argument("--eval-dir", default="", help="decontaminate: held-out benchmark documents parquet")
    p.add_argument("--min-overlap", type=int, default=2, help="decontaminate: shared-shingle threshold")
    p.add_argument("--capacity", type=int, default=2048, help="pack: tokens per training sequence")
    p.add_argument("--bloom", action="store_true", help="decontaminate: bloom-filter probe (bounded broadcast; false positives only)")
    p.add_argument("--lake-dir", default="", help="sql: directory of parquet tables to register as views")
    p.add_argument("--query", default="", help="sql: statement to run (or @file to read it from a file)")
    p.add_argument("--limit", type=int, default=20, help="sql: max rows to print when no --output-dir")
    args = p.parse_args(argv)

    if args.mode in ("curate", "audit", "decontaminate", "pack") and not args.docs_dir:
        p.error(f"{args.mode} requires --docs-dir")
    if args.mode == "sql" and (not args.lake_dir or not args.query):
        p.error("sql requires --lake-dir and --query")
    if args.mode == "decontaminate" and not args.eval_dir:
        p.error("decontaminate requires --eval-dir")
    regions = (
        [r.strip() for r in args.regions.split(",") if r.strip()]
        if args.regions
        else None
    )

    if args.mode == "ingest" and (not args.raw_dir or not args.output_dir):
        p.error("ingest requires --raw-dir and --output-dir")

    spark = get_spark("w4c-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.mode == "ingest":
        # The raw-lake ETL a migrating user runs FIRST: walk the
        # reference's comp_dir/region/subset/day/product NetCDF tree
        # (datasets.py:256-269), decode to the long layout, and build
        # the hive-partitioned Parquet frame lake every other mode
        # (and --frames-dir) reads. Decode-once: at 100 TB the NetCDF
        # tree is read a single time; downstream gets partition
        # pruning on (region, subset, day, product) plus column
        # pruning for free.
        from weather4cast_bigdata_spark.sources import netcdf

        if args.products:
            product_vars = {
                part.split("=", 1)[0].strip(): [
                    v.strip() for v in part.split("=", 1)[1].split(",") if v.strip()
                ]
                for part in args.products.split(";")
                if "=" in part
            }
            if not product_vars:
                p.error(f"--products parsed to nothing: {args.products!r}")
        else:
            product_vars = netcdf.DEFAULT_PRODUCT_VARS
        try:
            gh, gw = (int(v) for v in args.grid.lower().split("x"))
        except ValueError:
            p.error(f"--grid must be HxW, got {args.grid!r}")
        scanned = netcdf.scan_frame_files(
            spark, f"{args.raw_dir}/*/*/*/*/*.nc"
        ).where(F.col("product").isin(list(product_vars)))
        scanned = _region_filter(scanned, regions)
        decoded = netcdf.decode_frames(scanned, product_vars, grid=(gh, gw))
        netcdf.etl_to_parquet(decoded, args.output_dir)
        lake = spark.read.parquet(args.output_dir)
        n_files = scanned.count()
        n_cells = lake.count()
        parts = lake.select("region", "subset", "day", "product").distinct().count()
        print(
            f"ingested {n_files} frame files -> {n_cells} cells in "
            f"{parts} (region, subset, day, product) partitions at {args.output_dir}"
        )
        return 0

    if args.mode == "sql":
        # Generic ad-hoc surface: every parquet table in the lake dir
        # becomes a temp view (nanos-timestamp defenses included), then
        # the statement runs through Catalyst like any registry plan.
        from weather4cast_bigdata_spark.sources.catalog import discover_views

        views = discover_views(spark, args.lake_dir)
        stmt = args.query
        if stmt.startswith("@"):
            with open(stmt[1:]) as fh:
                stmt = fh.read()
        out = spark.sql(stmt)
        if args.output_dir:
            out.write.mode("overwrite").parquet(args.output_dir)
            n = spark.read.parquet(args.output_dir).count()
            print(f"registered views: {', '.join(sorted(views))}")
            print(f"wrote {n} rows to {args.output_dir}")
        else:
            out.show(args.limit, truncate=False)
        return 0

    if args.mode == "curate":
        from weather4cast_bigdata_spark.plans.curation import curate

        docs = spark.read.parquet(args.docs_dir)
        curated = curate(docs)
        if args.output_dir:
            curated.write.mode("overwrite").parquet(args.output_dir)
            curated = spark.read.parquet(args.output_dir)
        stats = (
            curated.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
            .orderBy("split")
            .collect()
        )
        for r in stats:
            print(f"{r['split']}: {r['n_docs']} docs, {r['n_tokens']} tokens")
        print(f"curated total: {sum(r['n_docs'] for r in stats)} of {docs.count()} input docs")
        return 0

    if args.mode == "decontaminate":
        from weather4cast_bigdata_spark.operators.curate_ext import (
            decontaminate,
            decontaminate_bloom,
        )

        docs = spark.read.parquet(args.docs_dir)
        ev = spark.read.parquet(args.eval_dir)
        probe = decontaminate_bloom if args.bloom else decontaminate
        flagged = probe(docs, ev, min_overlap=args.min_overlap)
        if args.output_dir:
            flagged.write.mode("overwrite").parquet(args.output_dir)
            flagged = spark.read.parquet(args.output_dir)
        n_bad = flagged.where(F.col("contaminated")).count()
        n_all = flagged.count()
        print(
            f"contaminated: {n_bad} of {n_all} docs "
            f"(>= {args.min_overlap} shared shingles with the eval set)"
        )
        return 0

    if args.mode == "pack":
        from weather4cast_bigdata_spark.operators.curate_ext import pack_chunked

        docs = spark.read.parquet(args.docs_dir)
        packed = pack_chunked(docs, capacity=args.capacity)
        if args.output_dir:
            packed.write.mode("overwrite").parquet(args.output_dir)
            packed = spark.read.parquet(args.output_dir)
        s = packed.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            (F.max("pack_last") + 1).alias("n_packs"),
        ).collect()[0]
        print(
            f"packed {s['n_docs']} docs / {s['n_tokens']} tokens into "
            f"{s['n_packs']} sequences of {args.capacity}"
        )
        return 0

    if args.mode == "audit":
        from weather4cast_bigdata_spark.operators import quality

        docs = spark.read.parquet(args.docs_dir)
        rules = {
            "doc_id_present": F.col("doc_id").isNotNull(),
            "text_present": F.col("text").isNotNull(),
            "text_nonempty": F.length(F.trim(F.col("text"))) > 0,
        }
        for r in quality.constraint_audit(docs, rules).orderBy("rule").collect():
            print(f"{r['rule']}: {r['n_violations']} violations / {r['n_rows']} rows")
        uniq = quality.uniqueness_violations(docs, ["doc_id"]).collect()[0]
        print(f"doc_id_unique: {uniq['n_duplicate_rows']} duplicate rows / {uniq['n_rows']} rows")
        return 0

    fx = _frames(spark, args)
    frames = _region_filter(fx["frames"], regions)
    decoded = weather.impute(weather.decode_normalize(frames, fx["variable_meta"]))

    if args.mode == "submit":
        if not args.submission_dir:
            p.error("submit requires --submission-dir")
        q = weather.quantize_for_submission(decoded, fx["variable_meta"])
        cells = q.select("region", "day", "variable", "ts", "y", "x", "qv")
        if args.submission_format == "h5":
            from weather4cast_bigdata_spark.sources import hdf5

            # Channel order is positional in the scorer (reference
            # datasets.py:415 target_vars) — pin to TARGET_VARS, never
            # alphabetical; unknown extra variables (custom lakes) go
            # last, alphabetically, so the contract vars keep their slots.
            present = {
                r["variable"]
                for r in fx["variable_meta"].select("variable").collect()
            }
            variables = [v for v in weather_fixtures.TARGET_VARS if v in present]
            variables += sorted(present - set(weather_fixtures.TARGET_VARS))
            manifest = hdf5.write_submission_h5(
                cells, args.submission_dir, variables=variables
            ).collect()
            n = sum(m["n_cells"] for m in manifest)
            fmt = manifest[0]["fmt"] if manifest else "h5"
            print(
                f"wrote {n} quantized cells to {len(manifest)} "
                f"(region, day) {fmt} files under {args.submission_dir}"
            )
            return 0
        weather.write_submission(cells, args.submission_dir)
        n = spark.read.parquet(args.submission_dir).count()
        print(f"wrote {n} quantized cells to {args.submission_dir}")
        return 0

    if args.mode == "evaluate":
        starts = weather.valid_start_times(frames, n_slots=4)
        n_starts = starts.count()
        losses = (
            decoded.groupBy("variable")
            .agg(F.avg(F.pow(F.col("norm") - F.lit(0.5), 2)).alias("mse_vs_const"))
            .orderBy("variable")
        )
        print(f"valid start times: {n_starts}")
        for r in losses.collect():
            print(f"{r['variable']}: mse_vs_const={r['mse_vs_const']:.6f}")
        return 0

    if args.mode == "evaluate_ensemble":
        preds = _region_filter(fx["predictions"], regions)
        k = weather_fixtures.ENSEMBLE_K
        variables = [r[0] for r in preds.select("variable").distinct().collect()]
        if not variables:
            p.error(
                f"no predictions after region filter {regions} — "
                "check the region names against the frame lake"
            )
        if args.ensemble_weights == "equal":
            w = [1.0 / k] * k
        else:
            w = list(
                weather.fit_ensemble_weights_plan(
                    preds,
                    sum1=(args.ensemble_weights == "ridge_lagrange"),
                    model_ids=range(k),
                )
            )
        weights_dim = spark.createDataFrame(
            [
                (v, m, float(w[m]), args.ensemble_weights)
                for v in variables
                for m in range(k)
            ],
            ["variable", "model_id", "weight", "scheme"],
        )
        blended = weather.blend_predictions(preds, weights_dim, scheme=args.ensemble_weights)
        score = weather.evaluate_blend(blended).collect()[0]
        print(f"weights ({args.ensemble_weights}): {[round(float(x), 4) for x in w]}")
        print(f"blend mse: {score['mse']:.6f}")
        return 0

    print(
        "train: the gradient loop lives inside the inference UDF boundary "
        "(SURVEY.md §2.8); data semantics are operators.setops.seeded_shuffle, "
        "the sample_* registry queries, and windows.past_sequence."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
