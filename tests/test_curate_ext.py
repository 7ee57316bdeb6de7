"""Edge-case tests for the wave-3 curation operators: packing
boundaries, decontamination thresholds, PII patterns, EWMA heads,
winsorize null handling. The registry-oracle replica covers the
happy path; these pin the corners the star schema can't reach."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions.text import pii_redact
from weather4cast_bigdata_spark.operators import aggregates, curate_ext
from weather4cast_bigdata_spark.operators.windows import ewma


# --- packing ----------------------------------------------------------------


def test_pack_chunked_matches_single_window_cumsum(spark):
    """The distributed two-pass prefix sum must equal the naive global
    window on any id distribution — including sparse/skewed ids that
    land many docs in one bucket and leave other buckets empty."""
    ids = [0, 1, 2, 5, 7, 100, 101, 102, 5000, 5001, 99999]
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * ((i % 13) + 1))) for i in ids], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["start_offset"], r["pack_first"], r["pack_last"])
        for r in curate_ext.pack_chunked(docs, capacity=7, n_buckets=4).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = docs.select(
        "doc_id",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tok"),
    ).withColumn("start", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    for r in naive.collect():
        start, n = r["start"], r["n_tok"]
        assert got[r["doc_id"]] == (start, start // 7, (start + n - 1) // 7)


def test_pack_chunked_capacity_boundaries(spark):
    """Docs that exactly fill a pack must not bleed into the next one;
    a doc longer than the capacity spans multiple packs."""
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h"), (3, " ".join("x" * 1 for _ in range(10)))],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curate_ext.pack_chunked(docs, capacity=4).collect()}
    assert (rows[1]["pack_first"], rows[1]["pack_last"]) == (0, 0)
    assert (rows[2]["pack_first"], rows[2]["pack_last"]) == (1, 1)
    # 10 tokens starting at offset 8 → packs 2..4
    assert (rows[3]["pack_first"], rows[3]["pack_last"]) == (2, 4)


# --- decontamination --------------------------------------------------------


def test_decontaminate_threshold_and_clean_docs(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox appears here"),  # shares 2 shingles
            (2, "quick brown fox"),  # shares 1 shingle ("quick brown fox")
            (3, "completely unrelated words only"),  # clean
            (4, "xy"),  # < n tokens: no shingles at all
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in curate_ext.decontaminate(train, ev, min_overlap=2).collect()
    }
    assert out[1] == (2, True)
    assert out[2] == (1, False)
    assert out[3] == (0, False)
    assert out[4] == (0, False)  # short doc still reported, not dropped


def test_decontaminate_bloom_superset_of_exact(spark):
    """Bloom membership has false positives only: every doc the exact
    operator flags must also be flagged by the bloom variant, and the
    bloom overlap count can never undercount."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.where(F.col("source") != "src0")
    ev = docs.where(F.col("source") == "src0")
    exact = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in curate_ext.decontaminate(train, ev, min_overlap=2).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_overlap_bloom"], r["contaminated"])
        for r in curate_ext.decontaminate_bloom(train, ev, min_overlap=2).collect()
    }
    assert set(exact) == set(bloom)
    for doc_id, (n_exact, flag_exact) in exact.items():
        n_bloom, flag_bloom = bloom[doc_id]
        assert n_bloom >= n_exact, doc_id
        if flag_exact:
            assert flag_bloom, doc_id


def test_decontaminate_bloom_tiny_filter_saturates(spark):
    """With m_bits=1 every position collides: all shingled docs hit
    every eval shingle — the degenerate bound that proves the flag is
    monotone in filter size."""
    ev = spark.createDataFrame(
        [(100, "p q r s")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [(1, "a b c d e"), (2, "xy")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in curate_ext.decontaminate_bloom(
            train, ev, min_overlap=2, m_bits=1
        ).collect()
    }
    assert out[1] is True  # 3 shingles, all collide into bit 0
    assert out[2] is False  # no shingles → can never be flagged


# --- PII redaction ----------------------------------------------------------


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        ("mail a.b+c%d@sub.example.co.uk now", "mail <EMAIL> now"),
        ("call 555-123-4567 or 555-0199", "call <PHONE> or <PHONE>"),
        ("host 192.168.0.1 down", "host <IP> down"),
        ("v1.2 release", "v1.2 release"),  # short dotted version untouched
        ("no pii here", "no pii here"),
    ],
)
def test_pii_redact_patterns(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "t string")
    assert df.select(pii_redact(F.col("t")).alias("r")).first()["r"] == want


# --- EWMA -------------------------------------------------------------------


def test_ewma_head_renormalizes(spark):
    """First rows (fewer than lookback lags) must renormalize over the
    available weights, and a constant series must stay constant."""
    rows = [(1, i, 10.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k int, t int, value double")
    out = ewma(df, ["k"], "t", "value", alpha=0.5, lookback=8).collect()
    assert all(abs(r["ewma"] - 10.0) < 1e-6 for r in out)


def test_ewma_weights_recent_more(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0), (1, 1, 0.0), (1, 2, 100.0)], "k int, t int, value double"
    )
    got = {r["t"]: r["ewma"] for r in ewma(df, ["k"], "t", "value", alpha=0.5).collect()}
    # at t=2: (100 + 0.5*0 + 0.25*0) / 1.75
    assert abs(got[2] - 100.0 / 1.75) < 1e-5
    assert got[0] == 0.0


def test_ewma_null_values_drop_from_both_sums(spark):
    df = spark.createDataFrame(
        [(1, 0, 4.0), (1, 1, None), (1, 2, 8.0)], "k int, t int, value double"
    )
    got = {r["t"]: r["ewma"] for r in ewma(df, ["k"], "t", "value", alpha=0.5).collect()}
    # t=2: (8 + 0.25*4) / 1.25 — the null contributes to neither sum
    assert abs(got[2] - 9.0 / 1.25) < 1e-5
    assert got[1] == 4.0  # only the lagged value remains


# --- winsorize / mixture ----------------------------------------------------


def test_winsorize_clips_outliers_and_drops_nulls(spark):
    vals = [float(v) for v in range(1, 100)] + [1e9]
    df = spark.createDataFrame(
        [("g", v) for v in vals] + [("g", None)], "grp string, value double"
    )
    row = aggregates.winsorized_stats(df, "grp", "value").first()
    assert row["n"] == 100  # null excluded
    assert row["winsor_mean"] < 200  # the 1e9 outlier is clipped to p95
    assert row["p_lo"] > 1.0 and row["p_hi"] < 1e9


def test_mixture_sample_rates_and_weights(spark):
    docs = spark.createDataFrame(
        [(i, "t", f"src{i % 2}") for i in range(2000)],
        "doc_id long, text string, source string",
    )
    kept = curate_ext.mixture_sample(docs, {"src0": 1.0, "src1": 0.25}).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["weight"])
    assert len(by_src["src0"]) == 1000  # rate 1.0 keeps everything
    assert 150 < len(by_src["src1"]) < 350  # ~25% of 1000
    assert set(by_src["src0"]) == {1.0}
    assert set(by_src["src1"]) == {4.0}
    # determinism: same input → identical kept set
    again = curate_ext.mixture_sample(docs, {"src0": 1.0, "src1": 0.25}).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in kept)


# --- substring repetition ---------------------------------------------------


def test_substring_dup_stats_flags_shared_spans(spark):
    from weather4cast_bigdata_spark.operators.dedup import substring_dup_stats

    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    docs = spark.createDataFrame(
        [
            (1, shared + " zeta eta theta"),      # windows at pos 0..3 (4 windows)
            (2, "iota " + shared + " kappa"),     # contains the same 5-gram
            (3, "all words here are unique ones"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in substring_dup_stats(docs, n=5).collect()}
    # doc1: 8 tokens → 4 windows, only the first window is shared
    assert (out[1]["n_windows"], out[1]["n_dup_windows"]) == (4, 1)
    assert (out[2]["n_windows"], out[2]["n_dup_windows"]) == (3, 1)
    assert (out[3]["n_windows"], out[3]["n_dup_windows"]) == (2, 0)
    assert out[3]["dup_ratio"] == 0.0


def test_substring_dup_stats_short_docs_report_zero(spark):
    from weather4cast_bigdata_spark.operators.dedup import substring_dup_stats

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "also very short text")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in substring_dup_stats(docs, n=5).collect()}
    assert out[1] == (1, 0, 0, 0.0) or (out[1]["n_windows"] == 0)
    assert out[2]["n_windows"] == 0 and out[2]["dup_ratio"] == 0.0


# --- chunking ---------------------------------------------------------------


def test_chunk_overlap_covers_every_token(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    chunks = curate_ext.chunk_overlap(docs, chunk_tokens=4, stride=2).collect()
    # starts 0,2,4,6 → 4 chunks; tail chunk truncated
    assert [r["chunk_idx"] for r in sorted(chunks, key=lambda r: r["chunk_idx"])] == [0, 1, 2, 3]
    covered = set()
    for r in chunks:
        toks = r["chunk_text"].split(" ")
        assert len(toks) == r["n_chunk_tokens"] <= 4
        covered.update(toks)
    assert covered == {f"t{i}" for i in range(10)}
    # consecutive chunks share stride-worth of context
    by_idx = {r["chunk_idx"]: r["chunk_text"].split(" ") for r in chunks}
    assert by_idx[0][2:] == by_idx[1][:2]


def test_chunk_overlap_short_doc_single_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    chunks = curate_ext.chunk_overlap(docs, chunk_tokens=64, stride=32).collect()
    assert len(chunks) == 1
    assert chunks[0]["chunk_text"] == "a b c"
    assert chunks[0]["n_chunk_tokens"] == 3


# --- semantic dedup ---------------------------------------------------------


def test_semantic_dedup_drop_rule(spark):
    """Pin the SemDeDup drop semantics on hand-built embeddings:
    cluster-local pairs above threshold drop the MORE centroid-
    similar member (keep-the-outlier); cross-cluster near-identical
    vectors are never compared; ties break toward the larger id."""
    import numpy as np

    from weather4cast_bigdata_spark.operators import similarity

    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = [
        # cluster 0: a/b are a near-dup pair; b is closer to the
        # centroid -> b drops, a (the outlier) survives
        (1, [0.9, 0.45]),   # csim ≈ 0.894
        (2, [1.0, 0.1]),    # csim ≈ 0.995, cos(1,2) ≈ 0.93
        # cluster 1: isolated -> kept
        (3, [0.0, 1.0]),
        # cluster 0, orthogonal-ish to a/b pair region -> kept
        (4, [0.72, -0.7]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(df, cents, threshold=0.9).collect()
    }
    assert len(out) == 4
    assert out[1]["kept"] is True
    assert out[2]["kept"] is False
    assert out[3]["kept"] is True and out[3]["cluster"] == 1
    assert out[4]["kept"] is True and out[4]["cluster"] == 0
    # exact tie on centroid_sim (mirror vectors, same csim): larger id drops
    tie = spark.createDataFrame(
        [(10, [0.8, 0.6]), (11, [0.8, 0.6])], "vec_id long, embedding array<double>"
    )
    tout = {
        r["vec_id"]: r
        for r in similarity.semantic_dedup(tie, cents, threshold=0.99).collect()
    }
    assert tout[10]["kept"] is True and tout[11]["kept"] is False


def test_inverted_index_band_and_postings(spark):
    """df band is inclusive; postings are the sorted doc list; tf
    counts within-doc repetition."""
    from weather4cast_bigdata_spark.operators import curate_ext

    mk = lambda i, t: (i, t)
    sh = "alpha beta gamma"  # one trigram shingle
    docs = spark.createDataFrame(
        [
            mk(1, sh),
            mk(2, sh),
            mk(3, sh + " " + sh),  # contains the shingle 2x (+bridges)
            mk(4, "delta epsilon zeta"),  # df=1 shingle -> filtered out
        ],
        "doc_id long, text string",
    )
    out = {
        r["shingle"]: r
        for r in curate_ext.inverted_index(docs, min_df=2, max_df=3).collect()
    }
    assert "delta epsilon zeta" not in out
    r = out["alpha beta gamma"]
    assert r["df"] == 3 and r["tf_total"] == 4
    assert list(r["postings"]) == [1, 2, 3]


def test_quantize_int8_error_bound_and_range(spark):
    """Scalar quantization invariants: every code is in [0, 255], a
    constant dimension codes to 0 with zero error contribution, and
    the per-element reconstruction error is bounded by
    span/(2*255) — the half-step bound that defines the scheme."""
    from weather4cast_bigdata_spark.operators import similarity

    rows = [
        (1, [0.0, 5.0, -3.0]),
        (2, [10.0, 5.0, 3.0]),
        (3, [2.5, 5.0, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings_int8(df).collect()}
    spans = [10.0, 1e-12, 6.0]
    for vid, vec in rows:
        codes = [int(c) for c in out[vid]["codes"].split(",")]
        assert all(0 <= c <= 255 for c in codes)
        assert codes[1] == 0  # constant dim
        # mean err <= mean of per-dim half-steps
        bound = sum(s / 255 / 2 for s in spans) / 3 + 1e-9
        assert out[vid]["mean_abs_err"] <= round(bound, 6) + 1e-6


def test_model_quality_scores_separation_and_determinism(spark):
    """The classifier must (a) score deterministically across
    partitionings, (b) separate an easy corpus: long wordy docs vs
    one-char docs get higher keep probability."""
    from weather4cast_bigdata_spark.operators import quality

    rows = [(i, "word " * 50) for i in range(10)] + [
        (100 + i, "x") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality.model_quality_scores(docs).collect()}
    out2 = {
        r["doc_id"]: r
        for r in quality.model_quality_scores(docs.repartition(7)).collect()
    }
    assert {k: v["quality_prob"] for k, v in out.items()} == {
        k: v["quality_prob"] for k, v in out2.items()
    }
    long_p = min(out[i]["quality_prob"] for i in range(10))
    short_p = max(out[100 + i]["quality_prob"] for i in range(10))
    assert long_p > short_p
    assert out[0]["keep"] and not out[100]["keep"]


# --- priority sampling / count-min sketch -----------------------------------


def test_priority_sample_exhaustive_when_k_exceeds_population(spark):
    """With k ≥ n every row is kept, τ = 0, and est_weight == weight
    (the exhaustive-census degenerate case of the estimator)."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f")], "doc_id long, text string"
    )
    rows = curate_ext.priority_sample(
        docs, k=10, weight=F.size(F.split(F.trim("text"), r"\s+"))
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["est_weight"] == r["weight"]


def test_priority_sample_ht_estimator_unbiased_shape(spark):
    """Sampled est_weights must each be ≥ the row's own weight and the
    selection must be exactly k rows with distinct ids."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from weather4cast_bigdata_spark.functions.text import tokens

    out = curate_ext.priority_sample(
        docs, k=25, weight=F.size(tokens(F.col("text")))
    ).collect()
    assert len(out) == 25
    assert len({r["doc_id"] for r in out}) == 25
    for r in out:
        assert r["est_weight"] >= r["weight"] - 1e-9


def test_count_min_never_underestimates(spark):
    from weather4cast_bigdata_spark.operators import aggregates
    from weather4cast_bigdata_spark.functions.text import tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("item"))
    est = aggregates.count_min_estimates(toks, "item", width=64, depth=3)
    tru = toks.groupBy("item").agg(F.count(F.lit(1)).alias("true_count"))
    joined = tru.join(est, on="item").collect()
    assert joined, "no tokens?"
    # narrow width forces collisions: estimates only ever overcount
    assert all(r["est"] >= r["true_count"] for r in joined)
    assert any(r["est"] > r["true_count"] for r in joined)


def test_count_min_table_tolerates_null_items(spark):
    """NULL items must not crash the fit (md5(NULL) yields a NULL
    bucket) and must not be counted — the documented drop-NULL
    contract of the join-based predecessor."""
    from weather4cast_bigdata_spark.operators import aggregates

    items = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",), (None,)], ["item"]
    )
    table = aggregates.count_min_table(items, "item", width=16, depth=2)
    # only the 3 non-NULL rows were counted
    assert all(sum(row) == 3 for row in table)


# --- product quantization ----------------------------------------------------


def test_pq_codes_seed_vectors_encode_to_themselves(spark):
    """A vector that IS a codebook seed must get its own code with
    distance 0 in every subspace (no other centroid can beat 0, and
    ties break to the lowest code — itself or an identical twin)."""
    from weather4cast_bigdata_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    seeds = {
        r["vec_id"]
        for r in emb.select(
            "vec_id",
            F.row_number()
            .over(
                Window.orderBy(
                    F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
                )
            )
            .alias("rn"),
        )
        .where(F.col("rn") <= 16)
        .collect()
    }
    codes = similarity.pq_codes(emb).collect()
    n_vec = emb.count()
    assert len(codes) == n_vec * 8
    assert all(0 <= r["code"] < 16 for r in codes)
    for r in codes:
        if r["vec_id"] in seeds:
            assert r["dist"] <= 1e-6, (r["vec_id"], r["sub"], r["dist"])


def test_pq_adc_ranks_code0_seed_first(spark):
    """The query IS the code-0 seed: its own ADC distance is 0 (all 8
    lookups hit its own codes), so it must rank first."""
    from weather4cast_bigdata_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    top = similarity.pq_adc_topk(emb, k=5).collect()
    assert len(top) == 5
    assert abs(top[0]["adc_dist"]) <= 1e-6
    assert top[0]["adc_dist"] <= top[-1]["adc_dist"]


def test_ivfpq_full_probe_matches_adc_and_partial_is_monotone(spark):
    """nprobe=None must equal exhaustive ADC exactly; a partial probe
    can only REMOVE candidates, so its rank-i distance is ≥ the full
    probe's rank-i distance and every returned (vec, dist) pair also
    appears in the exhaustive per-vector ADC distances."""
    from weather4cast_bigdata_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = similarity.ivfpq_adc_topk(emb, k=10, nprobe=None).collect()
    adc = similarity.pq_adc_topk(emb, k=10).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in full] == [
        (r["vec_id"], r["adc_dist"]) for r in adc
    ]
    partial = similarity.ivfpq_adc_topk(emb, k=10, nprobe=2).collect()
    assert 0 < len(partial) <= 10
    exhaustive = {
        (r["vec_id"], r["adc_dist"])
        for r in similarity.pq_adc_topk(emb, k=emb.count()).collect()
    }
    for i, r in enumerate(partial):
        assert (r["vec_id"], r["adc_dist"]) in exhaustive
        if i < len(full):
            assert r["adc_dist"] >= full[i]["adc_dist"] - 1e-9


def test_pq_codes_wide_matches_exploded_and_stored_adc(spark, tmp_path):
    """The wide (code_0..code_7) encode must agree column-for-column
    with the exploded pq_codes layout, and ADC recomputed from codes
    STORED through a partitioned parquet round trip must equal the
    in-memory in-row ADC for every vector — the sink_ivfpq_index
    lossless-round-trip invariant at unit scale."""
    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb_rows = similarity.pq_codebook_rows(emb)
    wide = similarity.pq_codes_wide(emb, codebook_rows=cb_rows)
    exploded = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in similarity.pq_codes(emb, codebook_rows=cb_rows).collect()
    }
    for r in wide.collect():
        for s in range(8):
            assert r[f"code_{s}"] == exploded[(r["vec_id"], s)]

    cents = similarity.kmeans_centroids(emb, k=4, iters=3, seed=42)
    bucketed = similarity.assign_ivf_buckets(emb, cents, nprobe=1)
    idx = similarity.pq_codes_wide(
        bucketed, codebook_rows=cb_rows, keep_cols=("ivf_bucket",)
    )
    out = str(tmp_path / "ivfpq")
    idx.repartition("ivf_bucket").write.partitionBy("ivf_bucket").parquet(out)
    stored = {
        r["vec_id"]: r["adc_dist"]
        for r in spark.read.parquet(out)
        .select("vec_id", similarity.adc_from_stored_codes(cb_rows))
        .collect()
    }
    in_memory = {
        r["vec_id"]: r["adc_dist"]
        for r in similarity.pq_adc_topk(emb, k=emb.count()).collect()
    }
    assert stored == in_memory


# --- DSIR importance resampling ----------------------------------------------


def test_dsir_weights_separate_target_like_docs(spark):
    """Docs drawn from the target vocabulary must score a strictly
    higher log importance weight than docs from a disjoint raw-only
    vocabulary, and the weights must be identical whether a doc is in
    the target subset or not (the model conditions on CONTENT, the
    target flag only fits p)."""
    tgt_text = "alpha beta gamma delta epsilon"
    raw_text = "zeta eta theta iota kappa"
    rows = [(i, tgt_text, True) for i in range(20)]
    rows += [(100 + i, raw_text, False) for i in range(20)]
    # two probe docs NOT in the target subset, one of each vocabulary
    rows += [(900, tgt_text, False), (901, raw_text, False)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    w = {
        r["doc_id"]: r["log_w"]
        for r in curate_ext.dsir_log_weights(docs, F.col("is_t")).collect()
    }
    assert w[900] > w[901]
    # content-identical docs get bit-identical weights regardless of flag
    assert w[900] == pytest.approx(w[0], abs=0.0)
    assert w[901] == pytest.approx(w[100], abs=0.0)


def test_dsir_score_smooths_unseen_buckets(spark):
    """Scoring a batch whose tokens never occurred in the fitted
    corpus must NOT drop them: each unseen-bucket token contributes
    the add-alpha smoothed default ln(alpha/(tgt_tot+alpha*B)) -
    ln(alpha/(raw_tot+alpha*B)) and still counts in n_tokens."""
    import math

    fit_rows = [(i, "alpha beta gamma", i < 5) for i in range(10)]
    fit = spark.createDataFrame(fit_rows, "doc_id long, text string, is_t boolean")
    model = curate_ext.dsir_bucket_model(fit, F.col("is_t"))
    # 3 tokens/doc * 10 docs
    raw_tot, tgt_tot, b = 30.0, 15.0, 1024.0
    default_lr = math.log(1.0 / (tgt_tot + b)) - math.log(1.0 / (raw_tot + b))
    batch = spark.createDataFrame(
        [(1, "qqqxyz zzzwww pppqqq rrrsss")], "doc_id long, text string"
    )
    got = curate_ext.dsir_score(batch, model).collect()[0]
    assert got["n_tokens"] == 4
    assert got["log_w"] == pytest.approx(4 * default_lr, rel=1e-12)
    # legacy model without totals keeps the strict inner-join contract
    legacy = model.select("b", "lr")
    assert curate_ext.dsir_score(batch, legacy).count() == 0
    # degenerate EMPTY stored model: the closed-form smoothed lr at
    # raw_tot=tgt_tot=0 is 0.0, never a silent NULL log_w
    empty = model.limit(0)
    got0 = curate_ext.dsir_score(batch, empty).collect()[0]
    assert got0["n_tokens"] == 4
    assert got0["log_w"] == pytest.approx(0.0, abs=0.0)


def test_dsir_resample_prefers_target_like_docs_and_is_deterministic(spark):
    """Gumbel-top-k over a corpus where half the docs are target-like:
    the selected set must be dominated by target-like docs and must be
    identical run-to-run (md5-derived noise, no RNG state)."""
    rows = [(i, "alpha beta gamma delta epsilon alpha beta", i < 30) for i in range(30)]
    rows += [(100 + i, "zeta eta theta iota kappa zeta eta", False) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    pick = lambda: sorted(
        r["doc_id"]
        for r in curate_ext.dsir_resample(docs, F.col("is_t"), k=20).collect()
    )
    first = pick()
    assert len(first) == 20
    assert sum(1 for d in first if d < 100) >= 15
    assert pick() == first


def test_unimax_closed_form_matches_sequential_loop(spark):
    """The windowed water-filling closed form must reproduce the
    paper's sequential allocation loop on skewed language mixes,
    including the all-capped (budget exceeds capacity) edge."""
    mixes = [
        {"en": 1000, "fr": 100, "de": 10},          # one dominant lang
        {"a": 5, "b": 5, "c": 5},                   # uniform
        {"x": 1, "y": 2, "z": 1000000},             # extreme skew
        {"solo": 42},                               # single language
    ]
    for budget_frac, max_epochs in [(0.4, 2.0), (0.9, 1.0), (5.0, 2.0)]:
        for mix in mixes:
            rows = []
            i = 0
            for lang, toks in mix.items():
                # split each lang's tokens across a few docs
                per = max(1, toks // 3)
                left = toks
                while left > 0:
                    t = min(per, left)
                    rows.append((i, lang, " ".join(["w"] * t)))
                    left -= t
                    i += 1
            docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
            got = {
                r["lang"]: r["epochs"]
                for r in curate_ext.unimax_sample(
                    docs, budget_frac=budget_frac, max_epochs=max_epochs
                )
                .select("lang", "epochs")
                .distinct()
                .collect()
            }
            # reference: the published sequential loop
            L = dict(mix)
            budget = sum(L.values()) * budget_frac
            remaining, alloc = budget, {}
            order = sorted(L, key=lambda l: (L[l] * max_epochs, l))
            for j, lang in enumerate(order):
                fair = remaining / (len(order) - j)
                alloc[lang] = min(max_epochs * L[lang], fair)
                remaining -= alloc[lang]
            for lang in L:
                want = alloc[lang] / L[lang]
                assert got[lang] == pytest.approx(want, rel=1e-12), (
                    mix, budget_frac, max_epochs, lang, got[lang], want,
                )


def test_line_dedup_global_removes_shared_lines_preserves_order(spark):
    """A footer line shared by two docs must vanish from both; unique
    lines survive in original order; a fully-duplicated doc reassembles
    to the empty string."""
    footer = " ".join(f"f{i}" for i in range(8))
    a_body = " ".join(f"a{i}" for i in range(16))
    b_body = " ".join(f"b{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, a_body + " " + footer),
            (2, b_body + " " + footer),
            (3, footer),  # nothing unique -> empty after dedup
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["clean"])
        for r in curate_ext.line_dedup_global(docs, line_tokens=8).collect()
    }
    assert got[1] == (3, 2, a_body)
    assert got[2] == (2, 1, b_body)
    assert got[3] == (1, 0, "")
