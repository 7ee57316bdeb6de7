"""Edge-case coverage for the text/dedup layer: inputs the synthetic
star schema never produces (empty / whitespace-only / sub-shingle /
unicode documents) must flow through every operator without crashing
and with defensible semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions import text
from weather4cast_bigdata_spark.operators import dedup, setops

EDGE_DOCS = [
    (1, ""),                       # empty
    (2, "   "),                    # whitespace only
    (3, "one"),                    # below shingle width
    (4, "two tokens"),             # still below 3-gram width
    (5, "exactly three tokens"),   # single shingle
    (6, "naïve café über ñandú"),  # non-ASCII
    (7, "a a a a a"),              # degenerate repetition
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EDGE_DOCS, ["doc_id", "text"])


def test_minhash_excludes_subshingle_docs(docs):
    """Docs with fewer than n tokens have no shingles and must be
    excluded (the grouped form's semantics), not emit null minima."""
    out = dedup.minhash_signatures_docs(docs, n=3).collect()
    ids = {r.doc_id for r in out}
    assert ids == {5, 6, 7}
    assert all(r[f"mh_{i}"] is not None for r in out for i in range(4))


def test_jaccard_no_self_or_crash(docs):
    out = dedup.ngram_jaccard_pairs_docs(docs, threshold=0.0).collect()
    assert all(r.id_a < r.id_b for r in out)


def test_simhash_runs_on_all_nonempty(docs):
    out = {r.doc_id: r.simhash for r in dedup.simhash(docs).collect()}
    # every doc tokenizes to ≥1 token (split of "" yields [""]), so
    # each gets a deterministic fingerprint
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}


def test_lang_id_und_on_empty(docs):
    out = {r.doc_id: r.lang for r in docs.select(
        "doc_id", text.lang_id(F.col("text")).alias("lang")).collect()}
    assert out[1] == "und" and out[2] == "und"
    assert out[7] == "en"  # 'a' is an English marker


def test_quality_score_no_crash_empty_scores_low(docs):
    """ANSI division-by-zero must not kill the job on an empty doc
    (try_divide); the empty doc lands at the bottom of the quality
    range — filterable without special null handling."""
    out = {r.doc_id: r.q for r in docs.select(
        "doc_id", text.quality_score(F.col("text")).alias("q")).collect()}
    assert out[1] is not None and out[1] < 0.05
    for i in (3, 4, 5, 6, 7):
        assert out[i] is not None and 0.0 <= out[i] <= 1.0


def test_fingerprint_deterministic_unicode(docs):
    a = {r.doc_id: r.fp for r in docs.select(
        "doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
    b = {r.doc_id: r.fp for r in docs.select(
        "doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()}
    assert a == b
    assert a[6] is not None


def test_stratified_split_covers_all_rows_deterministically(docs):
    out1 = {r.doc_id: r.split for r in setops.stratified_split(docs, "doc_id").collect()}
    out2 = {r.doc_id: r.split for r in setops.stratified_split(docs, "doc_id").collect()}
    assert out1 == out2
    assert set(out1) == {1, 2, 3, 4, 5, 6, 7}
    assert set(out1.values()) <= {"train", "validation", "test"}


def test_minhash_grouped_and_narrow_forms_agree(spark, sf_dir):
    """The shuffle-free per-row form and the explode+groupBy form are
    interchangeable implementations of the same signature (duplicate
    shingle hashes cannot change a min)."""
    from weather4cast_bigdata_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    narrow = {r.doc_id: (r.mh_0, r.mh_1, r.mh_2, r.mh_3)
              for r in dedup.minhash_signatures_docs(docs).collect()}
    grouped = {r.doc_id: (r.mh_0, r.mh_1, r.mh_2, r.mh_3)
               for r in dedup.minhash_signatures(dedup.doc_shingle_hashes(docs)).collect()}
    assert narrow == grouped


def test_jaccard_candidate_restriction(spark):
    """ngram_jaccard_pairs with an LSH candidate set returns exactly
    the candidate-filtered subset of the unrestricted pairs."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap at all"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    shingled = dedup.doc_shingle_hashes(docs)
    full = {(r.id_a, r.id_b) for r in
            dedup.ngram_jaccard_pairs(shingled, threshold=0.5).collect()}
    cands = spark.createDataFrame([(1, 4)], ["id_a", "id_b"])
    restricted = {(r.id_a, r.id_b) for r in
                  dedup.ngram_jaccard_pairs(shingled, threshold=0.5, candidates=cands).collect()}
    assert (1, 4) in full and restricted == {(1, 4)}


def test_lsh_max_bucket_caps_boilerplate(spark):
    """An over-populated LSH bucket (template docs sharing a band) is
    dropped under max_bucket; distinct docs still pair elsewhere."""
    boiler = [(i, "identical boilerplate text repeated verbatim here") for i in range(5)]
    pair = [(10, "a genuinely unique document about satellites and rain"),
            (11, "a genuinely unique document about satellites and rain")]
    docs = spark.createDataFrame(boiler + pair, ["doc_id", "text"])
    sig = dedup.minhash_signatures_docs(docs)
    uncapped = dedup.lsh_candidate_pairs(sig)
    capped = dedup.lsh_candidate_pairs(sig, max_bucket=3)
    assert uncapped.count() == 11  # C(5,2) boilerplate + (10,11)
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(10, 11)}


def test_jaccard_max_df_stoplist(spark):
    """max_df drops ubiquitous shingles; pair scores only fall (never
    rise), so thresholds stay conservative."""
    rows = [(i, f"shared common prefix text here plus unique tail {i}") for i in range(6)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    full = dedup.ngram_jaccard_pairs_docs(docs, threshold=0.0)
    stop = dedup.ngram_jaccard_pairs_docs(docs, threshold=0.0, max_df=5)
    f = {(r.id_a, r.id_b): r.jaccard for r in full.collect()}
    s = {(r.id_a, r.id_b): r.jaccard for r in stop.collect()}
    assert set(s) <= set(f)
    assert all(s[k] <= f[k] + 1e-12 for k in s)


def test_quantize_half_even_matches_numpy(spark):
    """half_even=True reproduces the reference's ndarray.round()
    (banker's rounding) bit-exactly at .5 ties, where the default
    oracle-aligned half-up mode deviates by one code unit."""
    import numpy as np
    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.functions import scalar

    vals = [0.5, 1.5, 2.5, 3.5, 0.25, 2.75]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = [
        r.q for r in df.select(
            scalar.quantize(F.col("x"), 0.0, 1.0, half_even=True).alias("q")
        ).collect()
    ]
    assert got == [int(np.round(v)) for v in vals]


def test_null_text_flows_through(spark):
    """NULL text (a corrupt row in a 100 TB corpus) must not crash
    any text operator: md5(NULL)=NULL groups exact-dedup NULLs
    together; tokenize/shingle yield empty/NULL and the doc drops out
    of signatures rather than erroring."""
    rows = [(1, "real content here today"), (2, None), (3, None)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {r.text_hash: r.n_copies for r in dedup.exact_duplicates(docs).collect()}
    assert exact.get(None) == 2  # both NULLs in the NULL-hash group
    assert dedup.minhash_signatures_docs(docs).count() == 1  # only doc 1
    q = docs.select(text.quality_score(F.col("text")).alias("q")).collect()
    assert len(q) == 3  # no crash; NULL rows yield NULL scores


def test_curate_survives_full_filtering(spark):
    """A corpus where every doc fails the quality cut (or that is
    empty) must curate to an empty result, not crash in the CC loop
    or the canonical join."""
    from weather4cast_bigdata_spark.plans.curation import curate

    junk = spark.createDataFrame(
        [(1, "!!!???...,,,;;;", "en", "s1", 15)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    assert curate(junk).count() == 0
    empty = junk.where(F.lit(False))
    assert curate(empty).count() == 0


def test_curate_derives_lang_when_absent(spark):
    """curate's input contract is (doc_id, text): lang is derived via
    lang_id when the column is missing."""
    from weather4cast_bigdata_spark.plans.curation import curate

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog of the town " * 5)],
        ["doc_id", "text"],
    )
    out = curate(docs).collect()
    assert len(out) == 1 and out[0].lang == "en"


def test_lsh_rejects_unbandable_signature(spark):
    import pytest as _pytest

    sig = spark.createDataFrame([(1, 1, 2, 3, 4)], ["doc_id", "mh_0", "mh_1", "mh_2", "mh_3"])
    with _pytest.raises(ValueError):
        dedup.lsh_candidate_pairs(sig, n_hashes=4, band_size=3)


def test_blas_near_dup_zero_vector_no_nan_pairs(spark):
    """An all-zero embedding must not emit NaN pairs from the BLAS
    path (NaN passes >= filters in Spark)."""
    from weather4cast_bigdata_spark.operators import similarity

    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 0.0], 0)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    pairs = similarity.near_dup_pairs_blas(df, bucket_col="label", threshold=0.5).collect()
    assert {(r.a_id, r.b_id) for r in pairs} == {(1, 2)}


def test_blas_near_dup_split_path_identical(spark):
    """The oversized-bucket block-pair split (split_bucket exceeded)
    must emit EXACTLY the one-task result: every unordered pair
    enumerated once, same float64 cosines — forced here by a tiny cap
    so both the diagonal (gi==gj) and cross (gi<gj) group branches
    run."""
    import numpy as np

    from weather4cast_bigdata_spark.operators import similarity

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], int(i % 2))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    one = similarity.near_dup_pairs_blas(
        df, bucket_col="label", threshold=0.2, split_bucket=10_000
    )
    split = similarity.near_dup_pairs_blas(
        df, bucket_col="label", threshold=0.2, split_bucket=8, n_blocks=4
    )
    a = {(r.a_id, r.b_id, r.cos_sim) for r in one.collect()}
    b = {(r.a_id, r.b_id, r.cos_sim) for r in split.collect()}
    assert a and a == b


def test_tfidf_topk_edges(spark):
    """Edge semantics: a single-doc corpus has idf = ln(1) = 0 for
    every term (all tfidf 0, rank by term asc); an empty document
    contributes its [""] token; ranks never exceed k; ties break by
    term ascending."""
    from weather4cast_bigdata_spark.functions.text import tfidf_topk

    one = spark.createDataFrame([(1, "alpha beta alpha")], ["doc_id", "text"])
    out = tfidf_topk(one, k=3).collect()
    assert all(r.tfidf == 0.0 for r in out)
    assert [r.term for r in sorted(out, key=lambda r: r.rank)] == ["alpha", "beta"]

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "x y q"), (3, "")], ["doc_id", "text"]
    )
    rows = tfidf_topk(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every doc (incl. the empty one, whose sole token is "") got ranks <= 2
    assert set(by_doc) == {1, 2, 3}
    assert all(1 <= r.rank <= 2 for r in rows)
    # the empty doc's single "" token is unique to it: idf = ln(3) > 0
    empty = by_doc[3]
    assert len(empty) == 1 and empty[0].term == "" and empty[0].tfidf > 0
    # doc 1: z is unique (idf ln 3), x/y shared by 2 docs (idf ln 1.5):
    # z must rank first
    assert sorted(by_doc[1], key=lambda r: r.rank)[0].term == "z"


# --- r4 curation-quality battery -------------------------------------------


def test_gopher_features_edge_docs(docs):
    from weather4cast_bigdata_spark.operators import curate_ext

    out = {r.doc_id: r for r in curate_ext.gopher_features(docs).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    # empty doc tokenizes to [""] → 1 word of length 0, no alpha, fails
    assert out[1].n_words == 1 and out[1].keep is False
    assert out[1].mean_word_len == 0.0
    # degenerate repetition: 5 short words, all alphabetic
    assert out[7].alpha_frac == 1.0 and out[7].keep is False


def test_dup_line_features_repeated_lines(spark):
    from weather4cast_bigdata_spark.operators import curate_ext

    line = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"{line} {line} x1 x2 x3 x4 x5 x6 x7 x8"),  # 2 dup + 1 unique
            (2, "a b c"),  # single line, no dups
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in curate_ext.dup_line_features(docs).collect()}
    assert out[1].n_lines == 3 and out[1].dup_lines == 2
    assert out[1].dup_line_frac == pytest.approx(2 / 3)
    # duplicated chars = 2 copies × len(line); total = 2*23 + 23
    assert out[1].dup_line_char_frac == pytest.approx(2 * 23 / (3 * 23))
    assert out[2].dup_lines == 0 and out[2].dup_line_char_frac == 0.0


def test_top_ngram_char_frac_tiebreak_and_subshingle(spark):
    from weather4cast_bigdata_spark.operators import curate_ext

    docs = spark.createDataFrame(
        [
            (1, "b c a a b c"),  # bigrams: "b c"×2, others ×1 → top = "b c"
            (2, "one"),          # sub-shingle: no bigram
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in curate_ext.top_ngram_char_frac(docs, n=2).collect()}
    assert out[1].top_ngram == "b c" and out[1].top_tf == 2
    assert out[1].top_ngram_char_frac == pytest.approx(2 * 3 / 11)
    assert out[2].top_tf == 0 and out[2].top_ngram is None
    assert out[2].top_ngram_char_frac == 0.0


def test_url_canonicalize_rules(spark):
    from weather4cast_bigdata_spark.operators import curate_ext

    cases = [
        # www + case + fragment + tracking params interleaved
        (1, "https://WWW.Example.COM/a/b?utm_source=x&id=3&ref=rss#frag"),
        # same canonical target from a different surface form
        (2, "https://example.com/a/b?utm_campaign=z&id=3"),
        # trailing slash + query that empties entirely
        (3, "http://Crawl.NET/path/?utm_medium=m"),
        (4, "http://crawl.net/path"),
        # path case is significant; host case is not
        (5, "https://example.com/A/B?id=3"),
    ]
    docs = spark.createDataFrame(cases, ["doc_id", "url"])
    out = {
        r.canonical_url: r
        for r in curate_ext.url_dedup(docs).collect()
    }
    assert out["https://example.com/a/b?id=3"].n_docs == 2
    assert out["https://example.com/a/b?id=3"].keeper_doc_id == 1
    assert out["http://crawl.net/path"].n_docs == 2
    assert "https://example.com/A/B?id=3" in out
    assert all(r.domain in {"example.com", "crawl.net"} for r in out.values())


def test_simhash_near_pairs_lossless_vs_brute_force(spark):
    """Pigeonhole candidate generation must find EVERY pair at
    Hamming distance <= k (Manku's losslessness claim): compare
    against the all-pairs bit_count(xor) cross join on a corpus
    small enough to brute-force."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(20)) + f" tail{i % 7} x{i % 3}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, bits = 2, 24
    got = {
        (r["doc_id_l"], r["doc_id_r"], r["hamming"])
        for r in dedup.simhash_near_pairs(docs, bits=bits, k=k).collect()
    }
    sig = dedup.simhash(docs, bits=bits)
    a = sig.select(F.col("doc_id").alias("l"), F.col("simhash").alias("s1"))
    b = sig.select(F.col("doc_id").alias("r"), F.col("simhash").alias("s2"))
    brute = {
        (r["l"], r["r"], r["h"])
        for r in a.crossJoin(b)
        .where(F.col("l") < F.col("r"))
        .select("l", "r", F.expr("bit_count(s1 ^ s2)").alias("h"))
        .where(F.col("h") <= k)
        .collect()
    }
    assert brute, "fixture must produce at least one near pair"
    assert got == brute


def _plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_simhash_near_pairs_max_bucket_caps_hot_block(spark):
    """Skew guard: a clone lake (one templated doc repeated) floods
    every (block, value) bucket; with ``max_bucket`` set, the hot
    buckets are dropped BEFORE the self-join so the stage stays
    linear, while pairs living in small buckets are untouched. The
    capped plan must still be an equi join (no nested loop)."""
    clone = "lorem ipsum dolor sit amet " * 4
    rows = [(i, clone) for i in range(50)]
    # two near-dup docs with a distinct vocabulary (their own buckets)
    base = " ".join(f"tok{j}" for j in range(30))
    rows += [(902, base), (903, base + " extra more")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.simhash_near_pairs(docs, bits=24, k=2)
    got_all = {(r["doc_id_l"], r["doc_id_r"]) for r in uncapped.collect()}
    assert (902, 903) in got_all
    assert sum(1 for l, r in got_all if l < 100 and r < 100) == 50 * 49 // 2
    capped = dedup.simhash_near_pairs(docs, bits=24, k=2, max_bucket=10)
    got_capped = {(r["doc_id_l"], r["doc_id_r"]) for r in capped.collect()}
    # the 52-doc clone buckets are dropped; the small bucket survives
    assert (902, 903) in got_capped
    assert not any(l < 100 and r < 100 for l, r in got_capped)
    plan = _plan_of(capped)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_jaccard_matches_brute_force(spark):
    """AllPairs + PPJoin positional filter vs the literal all-pairs
    Jaccard join: bit-identical pair set and scores on a corpus with
    varied doc lengths, partial overlaps near the threshold, and
    shared boilerplate — the shapes a wrong positional bound (which
    may only ever ADMIT extra candidates, never drop a true pair)
    would break first."""
    import itertools

    rng_words = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(24):
        # overlapping sliding vocab windows of varying width: pairs
        # span the whole Jaccard range incl. just-above/below 0.5
        width = 6 + (i % 7)
        start = (i * 3) % len(rng_words)
        words = [rng_words[(start + j) % len(rng_words)] for j in range(width)]
        if i % 4 == 0:
            words += ["all", "rights", "reserved"]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.prefix_filtered_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # brute force on the same shingle definition
    hs = {
        r["doc_id"]: set(r["hs"])
        for r in docs.select(
            "doc_id",
            F.array_distinct(
                F.transform(
                    dedup.word_shingles(dedup.tokens(F.col("text")), 3),
                    dedup.md5_hash32,
                )
            ).alias("hs"),
        ).collect()
        if r["hs"]
    }
    want = set()
    for a, b in itertools.combinations(sorted(hs), 2):
        inter = len(hs[a] & hs[b])
        if inter:
            j = inter / (len(hs[a]) + len(hs[b]) - inter)
            if j >= 0.5:
                want.add((a, b, j))
    assert want, "fixture must produce true pairs"
    assert got == want


def test_prefix_jaccard_split_path_is_lossless(spark):
    """Oversized-bucket split: forcing every prefix bucket down the
    salted two-sided self-join route (split_bucket=2) must return
    EXACTLY the default enumeration's pairs — the split changes where
    pairs are enumerated, never which pairs exist. The split plan
    must stay equi-join only."""
    rows = []
    for i in range(12):
        # 4 clone families of 3 near-identical docs + shared boilerplate
        fam = i % 4
        rows.append(
            (
                i,
                f"family {fam} body token{fam} alpha beta gamma delta "
                f"epsilon zeta tail{i % 3} all rights reserved",
            )
        )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.prefix_filtered_jaccard_pairs(docs, threshold=0.3).collect()
    }
    forced = dedup.prefix_filtered_jaccard_pairs(
        docs, threshold=0.3, split_bucket=2, n_salt=4
    )
    split = {(r["id_a"], r["id_b"], r["jaccard"]) for r in forced.collect()}
    assert base, "fixture must produce pairs"
    assert split == base
    plan = _plan_of(forced)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_catches_embedded_doc_jaccard_misses(spark):
    """A short doc fully embedded in a 10x-longer one: containment
    must flag it at C = 1.0 in the contained->container direction
    only, while symmetric Jaccard at the same 0.8 cut misses it —
    the operator's reason to exist."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"filler{i} pad{i} body{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "unrelated words entirely here now")],
        "doc_id long, text string",
    )
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in dedup.ngram_containment_pairs_docs(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}
    assert (
        dedup.ngram_jaccard_pairs_docs(df, threshold=0.8).count() == 0
    )


def test_simhash_wide_hash_lossless_vs_brute_force(spark):
    """The 60-bit-hash signature family (the r9 scale-adaptive width
    past 32 bits) must keep Manku's losslessness: every pair at
    Hamming distance <= k of the 3w-bit md5_hash60-based signature is
    found by the pigeonhole join — including block widths whose
    slices reach past bit 32."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(20)) + f" tail{i % 7} x{i % 3}")
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k, bits = 2, 39  # w = 13, the sf10 adaptive width
    got = {
        (r["doc_id_l"], r["doc_id_r"], r["hamming"])
        for r in dedup.simhash_near_pairs(
            docs, bits=bits, k=k, hash_bits=60
        ).collect()
    }
    sig = dedup.simhash(docs, bits=bits, hash_bits=60)
    a = sig.select(F.col("doc_id").alias("l"), F.col("simhash").alias("s1"))
    b = sig.select(F.col("doc_id").alias("r"), F.col("simhash").alias("s2"))
    brute = {
        (r["l"], r["r"], r["h"])
        for r in a.crossJoin(b)
        .where(F.col("l") < F.col("r"))
        .select("l", "r", F.expr("bit_count(s1 ^ s2)").alias("h"))
        .where(F.col("h") <= k)
        .collect()
    }
    assert got == brute


def test_simhash_fractional_widths_lossless(spark):
    """Fractional block widths (r10: total bits not divisible by 3 —
    the first B%3 blocks carry one extra bit) keep the pigeonhole
    losslessness at distance <= k, across the 32-bit and 60-bit hash
    families and both straddle shapes (B%3 = 1 and 2)."""
    rows = [
        (i, " ".join(f"w{j}" for j in range(15)) + f" tail{i % 5} y{i % 2}")
        for i in range(50)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    k = 2
    for bits, hb in ((25, 32), (26, 32), (40, 60)):
        got = {
            (r["doc_id_l"], r["doc_id_r"], r["hamming"])
            for r in dedup.simhash_near_pairs(
                docs, bits=bits, k=k, hash_bits=hb
            ).collect()
        }
        sig = dedup.simhash(docs, bits=bits, hash_bits=hb)
        a = sig.select(F.col("doc_id").alias("l"), F.col("simhash").alias("s1"))
        b = sig.select(F.col("doc_id").alias("r"), F.col("simhash").alias("s2"))
        brute = {
            (r["l"], r["r"], r["h"])
            for r in a.crossJoin(b)
            .where(F.col("l") < F.col("r"))
            .select("l", "r", F.expr("bit_count(s1 ^ s2)").alias("h"))
            .where(F.col("h") <= k)
            .collect()
        }
        assert got == brute, (bits, hb)


def test_simhash_adaptive_bits_chain_python_sql_agree():
    """The Spark plan derives the SimHash signature width (total
    bits B, 1-bit fractional steps) from the corpus count
    driver-side; the oracle re-derives it with the embedded
    integer-comparison chain — the two must agree at every corpus
    size, including the 24-bit legacy floor and the 60-bit hash
    ceiling, and B must be monotone with 1-bit steps."""
    import duckdb

    from weather4cast_bigdata_spark.plans.registry_quality import (
        _simhash_bits,
        _simhash_bits_sql,
        _simhash_cap,
    )

    con = duckdb.connect()
    prev = None
    for n in (1, 64, 500, 5000, 8192, 8193, 16384, 16385, 19660,
              19661, 50000, 150000, 500000, 10**7, 10**8, 10**12):
        got = con.execute(f"SELECT {_simhash_bits_sql(str(n))}").fetchone()[0]
        assert got == _simhash_bits(n), (n, got, _simhash_bits(n))
        if prev is not None:
            assert got >= prev
        prev = got
    # legacy floor: both bench gates stay at the recorded 24-bit form
    assert _simhash_bits(8192) == 24 and _simhash_bits(16384) == 24
    # first fractional step is ONE bit, not a whole block
    assert _simhash_bits(16385) == 25
    # ceiling saturates at the 60-bit hash limit
    assert _simhash_bits(10**12) == 60
    # capacity thresholds are strictly monotone (the chain's premise)
    caps = [_simhash_cap(b) for b in range(24, 60)]
    assert caps == sorted(caps) and len(set(caps)) == len(caps)
