"""Physical-plan shape regression guards.

EXPLAIN.md records the audited plan shapes; these tests pin the
load-bearing properties so a future edit that silently degrades a
plan (an extra shuffle, a broadcast that became a sort-merge, a
nested-loop join appearing where none belongs) fails CI instead of
surfacing as a scale incident. Shapes are asserted with AQE disabled
(same discipline as tools/explain_audit.py): AQE may *improve* a
plan at runtime but never changes the declared strategy.
"""

from __future__ import annotations

import re

import pytest

from weather4cast_bigdata_spark.plans.registry import REGISTRY


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _counts(plan: str) -> dict[str, int]:
    # Node headers only: formatted explain prints each node in both
    # the tree and the detail section.
    return {
        # shuffle exchanges only — broadcast exchanges are the cheap kind
        "exch": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "bnl": len(
            re.findall(r"^\(\d+\) (?:BroadcastNestedLoopJoin|CartesianProduct)", plan, re.M)
        ),
        "smj": len(re.findall(r"^\(\d+\) \*?\s?SortMergeJoin", plan, re.M)),
        "bhj": len(re.findall(r"^\(\d+\) \*?\s?BroadcastHashJoin", plan, re.M)),
    }


@pytest.fixture()
def noaqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", old)


# (query, max shuffle exchanges, allowed nested-loop joins).
# The allowed bnl are all declared 1-row broadcast normalizers or the
# brute-force ANN correctness baseline (EXPLAIN.md).
SHAPES = [
    ("dedup_exact", 1, 0),
    # narrow projection; the 1 allowed exchange is ensure_min_parallelism's
    # small-input repartition (a no-op at real scan parallelism)
    ("dedup_minhash_signature", 1, 0),
    ("dedup_minhash_lsh", 3, 0),
    ("dedup_ngram_jaccard", 3, 0),
    ("sim_cosine_topk", 1, 1),  # declared brute-force baseline
    ("sim_hyperplane_lsh", 0, 0),
    ("text_fingerprint", 0, 0),
    ("text_tfidf_topk", 4, 1),  # 1-row corpus-size normalizer
    ("join_range_binned", 2, 0),  # binned rewrite: NO nested loop
    ("sample_stratified_split", 0, 0),
    ("join_asof_nearest", 1, 0),
    ("window_sessionize", 1, 0),
    ("agg_salted", 2, 0),
    # wave-3 curation layer
    ("text_repetition_score", 1, 0),  # run-length fold: NO explode shuffle
    ("sample_mixture_weighted", 0, 0),  # pure md5-threshold projection
    ("text_pii_redact", 0, 0),  # chained regexp projection
    ("window_ewma", 1, 0),  # one key shuffle; truncated lag chain
    ("dedup_substring_spans", 4, 0),  # int-keyed hash/join/count only
    ("join_interval_overlap", 3, 0),  # binned rewrite: NO nested loop
    # star join: both dims broadcast, the agg is the only shuffle,
    # the LIMIT must plan as TakeOrderedAndProject (asserted below)
    ("flagship_star_join", 1, 0),
    # closing-wave additions
    ("flagship_pricing_summary", 1, 0),  # scan-bandwidth flagship: one agg shuffle
    ("agg_moments", 1, 0),  # power sums: partial-agg, one exchange
    ("dim_scd2_build", 1, 0),  # three window passes reuse ONE key sort
    ("window_range_trailing", 1, 0),
    ("project_pivot_wide", 2, 0),  # explicit values: NO distinct pre-scan pass
    ("window_resample_interpolate", 2, 0),
    ("join_fuzzy_blocked", 1, 0),  # blocked candidates: NO cartesian distance scan
    ("embed_quantize_int8", 2, 1),  # 1-row codebook broadcast (declared benign)
    ("text_inverted_index", 6, 0),
    # as-of rewrite: union + window, NO range join, NO nested loop
    ("join_point_in_time", 2, 0),
    # exact prefix-filtered all-pairs join: df count/join, per-doc
    # re-sort, prefix buckets, pair distinct, verify joins — every
    # exchange linear in corpus size (or in the Zipf-bounded
    # candidate set), NO cartesian/nested loop anywhere
    ("dedup_jaccard_prefix", 6, 0),
    # PQ family: codebook + ADC lookup folded into the projection as
    # constant-folded literals — pure narrow scan→project(→TakeOrdered)
    ("embed_pq_codes", 0, 0),
    ("sim_pq_adc_topk", 0, 0),
    ("sim_ivfpq_topk", 0, 0),
    # stored-index search: scan of the persisted code lake -> project -> TakeOrdered
    ("sink_ivfpq_index", 0, 0),
    # r4 curation-quality battery — the three per-doc scorers are
    # run-length folds / narrow projections (the 1 allowed exchange
    # is ensure_min_parallelism's small-input repartition); URL dedup
    # is exactly one canonical-key shuffle on top of it
    ("text_gopher_rules", 1, 0),
    ("text_c4_rules", 1, 0),
    ("text_dup_line_fraction", 1, 0),
    ("text_top_ngram_char_frac", 1, 0),
    ("text_url_dedup", 2, 0),
    # composed gate = ONE projection (no joins between battery outputs)
    ("curation_quality_gate", 1, 0),
    # DSIR: 2 corpus-pass repartitions + bucket-stats groupBy +
    # 1024-row totals window + per-doc sum; the log-ratio dim rides a
    # broadcast join — NO corpus self-join, NO third corpus scan
    ("text_dsir_weights", 5, 0),
    ("sample_dsir_resample", 5, 0),
    # UniMax: lang-stats groupBy + windows over the languages-sized
    # frame; the epoch-rate dim broadcasts back — NO driver loop
    ("sample_unimax", 4, 0),
    # global line dedup: line-df groupBy, join-back, totals +
    # reassembly groupBys — every exchange linear, NO window over the
    # corpus for reassembly order (struct sort inside the array)
    ("text_line_dedup_global", 6, 0),
    # CCNet tertiles: the unigram-logprob plan + doc_id join-back +
    # one lang-keyed ntile window; the bnl is the 1-row corpus-total
    # normalizer broadcast (declared benign, same as text_tfidf_topk)
    ("text_perplexity_buckets", 4, 1),
    # Manku pigeonhole: signature groupBy + (block, value) equi
    # self-join + pair distinct — NO all-pairs Hamming scan, NO
    # nested loop (measured 1 exch at sf0.001 where the block side
    # broadcasts; 4 allows the sort-merge path at larger inputs)
    ("dedup_simhash_hamming", 4, 0),
    # h5 submission export: decode fixture + meta normalize join +
    # ONE shuffle into the (region, day) groupBy feeding the
    # applyInPandas writer — no extra exchange after the group
    ("sink_submission_h5", 2, 0),
    # pinned-coefficient quality scoring: constant-folded projection,
    # zero exchanges (the model is a literal, not a join)
    ("quality_model_filter_verified", 0, 0),
    # streaming submission manifest: hive-partitioned manifest read +
    # one latest-rewrite-per-file window — the incremental write work
    # happened inside foreachBatch, batch-invariance pinned in
    # tests/test_etl_inference_streaming.py
    ("streaming_submission_h5", 1, 0),
    # persisted exact-dedup index: hash projection + repartition on
    # the write axes; the probe joins the pruned stored lake on
    # (shard, text_hash) — broadcast at this SF, shard-pruned always
    ("sink_exact_dedup_index", 2, 0),
    # GK sketch bound-check: sketch agg + broadcast of the 3-row
    # group stats + rank recount; the third exchange is the 3-row
    # output sort (range partitioning of the group count, not data)
    ("agg_approx_percentile_verified", 3, 0),
    # asymmetric containment: the SAME single-shuffle bucket
    # enumeration as dedup_ngram_jaccard (union of two direction
    # projections adds no corpus exchange); budget matches its twin
    ("dedup_ngram_containment", 3, 0),
    # streaming exact-dedup drain: matches-lake read + canonical
    # distinct — the incremental hash/probe work happened inside
    # foreachBatch (batch-invariance pinned in the streaming tests)
    ("streaming_exact_dedup_ingest", 1, 0),
    # r7 LSH family: census groupBy + candidate equi-join are the only
    # exchanges; the hot-bucket guard is a broadcast anti join
    ("sim_lsh_multiprobe", 2, 0),
    ("sim_lsh_banded", 2, 0),
    # brute-force truth side is the declared baseline (1 bnl, like
    # sim_cosine_topk); the two exchanges are the census + the
    # sample/corpus repartitions
    ("sim_lsh_recall", 2, 1),
    # histogram-refine: every exchange carries either tiny hist rows
    # or only needed-bucket rows — never a full-data shuffle
    ("agg_percentile_histref", 7, 0),
]


@pytest.mark.parametrize("name,max_exch,max_bnl", SHAPES)
def test_plan_shape(noaqe, sf_dir, name, max_exch, max_bnl):
    plan = _formatted_plan(REGISTRY[name].fn(noaqe, sf_dir))
    c = _counts(plan)
    assert c["exch"] <= max_exch, f"{name}: {c['exch']} shuffles > {max_exch}\n{plan}"
    assert c["bnl"] <= max_bnl, f"{name}: unexpected nested-loop join\n{plan}"
    if name == "sink_submission_h5":
        # one writer TASK per (region, day) file: the grouped Pandas
        # writer must be in-plan, not a driver loop
        assert "FlatMapGroupsInPandas" in plan, plan


def test_static_dim_joins_are_broadcast(noaqe, sf_dir):
    """The static-dim join must broadcast every dim side — zero
    shuffle exchanges in the whole plan."""
    plan = _formatted_plan(REGISTRY["join_static_broadcast"].fn(noaqe, sf_dir))
    c = _counts(plan)
    assert c["bhj"] >= 1 and c["exch"] == 0, plan


def test_star_join_topk_is_take_ordered(noaqe, sf_dir):
    """The star-join flagship's LIMIT must plan as
    TakeOrderedAndProject (per-partition top-k before the
    single-reducer merge), never a full global sort."""
    plan = _formatted_plan(REGISTRY["flagship_star_join"].fn(noaqe, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_decontaminate_broadcasts_eval_shingles(noaqe, sf_dir):
    """The eval-shingle probe must reach the training side as a
    broadcast join — the 100 TB training corpus never shuffles its
    shingles for the contamination check."""
    plan = _formatted_plan(REGISTRY["text_decontaminate"].fn(noaqe, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bloom_decontaminate_probes_in_row(noaqe, sf_dir):
    """r11 restructure pin: the Bloom probe's train side tests its
    k=3 slice positions IN-ROW via chained LEFT SEMI broadcast
    probes — no posexplode of positions into rows (the old k× probe
    volume) and no (doc, shingle)-keyed aggregate. Exactly 3
    Generate nodes remain (eval shingle+position explodes, train
    shingle explode) and the probe chain is 3 semi joins."""
    plan = _formatted_plan(
        REGISTRY["text_decontaminate_bloom"].fn(noaqe, sf_dir)
    )
    assert plan.count("BroadcastHashJoin LeftSemi") >= 3, plan
    gens = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    assert gens == 3, (gens, plan)
    # the countDistinct(j) stage is gone with the explode
    assert "posexplode" not in plan, plan


def test_line_dedup_totals_are_analytic(noaqe, sf_dir):
    """r11 restructure pin: the per-doc line total is the narrow
    ceil(n_tokens/8) projection, not a second end-to-end pass over
    the exploded lines — exactly 2 Generate nodes (df-census pass +
    reassembly pass) — and the final join must NOT broadcast the
    reassembled side (a corpus-cardinality text column): the merge
    hint pins SortMergeJoin."""
    plan = _formatted_plan(
        REGISTRY["text_line_dedup_global"].fn(noaqe, sf_dir)
    )
    gens = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    assert gens == 2, (gens, plan)
    assert "SortMergeJoin LeftOuter" in plan, plan
    assert "BroadcastHashJoin LeftOuter" not in plan, plan


def test_ngram_pair_stage_carries_max_df_cap(noaqe, sf_dir):
    """The shingle-bucket pair stage must carry the finite max_df
    stop-list by DEFAULT (a shingle in d docs emits d(d-1)/2 pair
    rows; uncapped boilerplate is the one web-scale blowup in the
    dedup family). Asserted in the physical plan for the pair query;
    the curation flagship's plan truncates at the eager
    connected-components checkpoint, so its cap is pinned at the
    signature level (curate() and the operator share the same
    default constant)."""
    import inspect

    from weather4cast_bigdata_spark.operators.dedup import (
        NGRAM_MAX_DF,
        ngram_jaccard_pairs_docs,
    )
    from weather4cast_bigdata_spark.plans.curation import curate

    plan = _formatted_plan(REGISTRY["dedup_ngram_jaccard"].fn(noaqe, sf_dir))
    assert f"<= {NGRAM_MAX_DF})" in plan, plan
    assert inspect.signature(curate).parameters["max_df"].default == NGRAM_MAX_DF
    assert (
        inspect.signature(ngram_jaccard_pairs_docs).parameters["max_df"].default
        == NGRAM_MAX_DF
    )


def test_range_join_binned_broadcasts_interval_side(noaqe, sf_dir):
    """The interval spine is generated from a 1-row aggregate: the
    fact side must never shuffle for the join itself — the only
    exchanges belong to the spine build and the final group-by."""
    plan = _formatted_plan(REGISTRY["join_range_binned"].fn(noaqe, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_curation_label_joinback_plan(noaqe, sf_dir):
    """The CC label join-back is the curation flagship's one stage
    AQE must get right at web scale (SCALING.md §2: 30-50% near-dup
    rates make comp corpus-sized; a FORCED broadcast would OOM,
    a hint-less plan lets AQE broadcast only when comp measures
    small). Pin the structural halves of that contract (the runtime
    half is measured on the clone-heavy lake,
    tools/curation_skew_probe.py → SCALING.md §7g):
    1. no broadcast hint anywhere on the comp side — with broadcast
       ruled out by threshold, the join compiles to the scale-safe
       SortMergeJoin on doc_id;
    2. with default thresholds at this SF, the tiny comp side DOES
       broadcast — the small-corpus fast path stays intact."""
    from weather4cast_bigdata_spark.plans import curation
    from weather4cast_bigdata_spark.sources.catalog import load_table

    docs = load_table(noaqe, sf_dir, "documents").select("doc_id", "text")
    # corpus-sized comp regime: force the count gate closed AND rule
    # out estimator broadcasts — the pipeline must compile to the
    # scale-safe sort-merge with no hidden hint anywhere
    old = noaqe.conf.get("spark.sql.autoBroadcastJoinThreshold")
    saved = curation.BROADCAST_LABELS_MAX_ROWS
    try:
        curation.BROADCAST_LABELS_MAX_ROWS = -1
        noaqe.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _formatted_plan(curation.curate(docs))
        assert "BroadcastHashJoin" not in plan, plan
        # the tree section prints the join type inline
        assert "SortMergeJoin LeftOuter" in plan, plan
    finally:
        curation.BROADCAST_LABELS_MAX_ROWS = saved
        noaqe.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # small-comp regime: the measured count gate broadcasts the label
    # table even though the checkpointed comp has no size stats (the
    # AQE/estimator blind spot the clone-heavy probe exposed)
    plan = _formatted_plan(curation.curate(docs))
    assert re.search(r"BroadcastHashJoin LeftOuter", plan), plan


def test_explain_md_covers_every_audited_query():
    """EXPLAIN.md must carry a row for every query the plan audit
    claims to cover (bench HEADLINE + explain_audit AUDIT_EXTRA) —
    the r6 close shipped a headline (streaming_exact_dedup_ingest)
    that landed after the last regen, so the doc trailed the
    registry. Adding a headline now forces a
    ``python tools/explain_audit.py`` regen or this fails."""
    import os
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    sys.path.insert(0, os.path.join(root, "tools"))
    from bench import HEADLINE
    from explain_audit import AUDIT_EXTRA

    text = open(os.path.join(root, "EXPLAIN.md")).read()
    missing = [
        q for q in set(HEADLINE) | set(AUDIT_EXTRA)
        if f"| `{q}`" not in text and f"### {q}" not in text
    ]
    assert not missing, (
        f"EXPLAIN.md is stale — regenerate with tools/explain_audit.py; "
        f"missing rows: {sorted(missing)}"
    )
