"""Property-based tests (hypothesis): algebraic invariants that hold
for ALL inputs, not just the fixtures — the solver identities are
pure numpy (fast, hundreds of examples); the Spark properties run a
bounded number of examples because each is a full job."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from weather4cast_bigdata_spark.solve import solve_ridge, solve_ridge_sum1


def _psd_system(draw, k):
    x = draw(
        st.lists(
            st.lists(
                st.floats(-10, 10, allow_nan=False, allow_infinity=False),
                min_size=k, max_size=k,
            ),
            min_size=2 * k, max_size=2 * k,
        )
    )
    a = np.array(x, dtype=np.float64)
    ata = a.T @ a + 1e-3 * np.eye(k)  # PSD + full-rank
    y = draw(
        st.lists(
            st.floats(-10, 10, allow_nan=False, allow_infinity=False),
            min_size=k, max_size=k,
        )
    )
    return ata, np.array(y, dtype=np.float64)


@st.composite
def gram_systems(draw, k_max=5):
    k = draw(st.integers(2, k_max))
    return _psd_system(draw, k)


@given(gram_systems())
@settings(max_examples=200, deadline=None)
def test_sum1_constraint_always_holds(sys_):
    """The Lagrange-bordered solve returns weights summing to exactly
    1 for any full-rank PSD Gram system."""
    ata, aty = sys_
    w = solve_ridge_sum1(ata, aty)
    assert abs(float(np.sum(w)) - 1.0) < 1e-8


@given(gram_systems(), st.floats(0.1, 100.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_ridge_scale_invariance(sys_, c):
    """Scaling ATA and ATy by the same constant leaves the weights
    unchanged — λ is proportional to mean(diag ATA), so the whole
    system rescales consistently. This is what makes the running-mean
    Gram accumulation (ensemble.py:35-36 semantics) equivalent to the
    plain-sum form: both differ only by a 1/N factor."""
    ata, aty = sys_
    w1 = solve_ridge(ata, aty)
    w2 = solve_ridge(c * ata, c * aty)
    np.testing.assert_allclose(w1, w2, rtol=1e-7, atol=1e-9)


@given(gram_systems())
@settings(max_examples=200, deadline=None)
def test_ridge_approaches_exact_solution(sys_):
    """As reg_scale → 0 the ridge solution converges to the exact
    normal-equations solution on a well-conditioned system."""
    ata, aty = sys_
    exact = np.linalg.solve(ata, aty)
    w = solve_ridge(ata, aty, reg_scale=1e-12)
    np.testing.assert_allclose(w, exact, rtol=1e-4, atol=1e-6)


# --- Spark-side properties (bounded example counts) -------------------------


@given(
    st.lists(
        st.tuples(st.integers(0, 10_000_000), st.integers(1, 300)),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    st.integers(2, 512),
)
@settings(max_examples=8, deadline=None)
def test_pack_chunked_is_exact_cumsum(spark, docs_spec, capacity):
    """For ANY id distribution and capacity: start offsets are the
    id-ordered exclusive prefix sum of token counts, and pack spans
    are floor-division of the span endpoints."""
    from weather4cast_bigdata_spark.operators.curate_ext import pack_chunked

    rows = [(i, " ".join(["w"] * n)) for i, n in docs_spec]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in pack_chunked(df, capacity=capacity, n_buckets=7).collect()
    }
    start = 0
    for i, n in sorted(docs_spec):
        r = got[i]
        assert (r["n_tok"], r["start_offset"]) == (n, start)
        assert r["pack_first"] == start // capacity
        assert r["pack_last"] == (start + n - 1) // capacity
        start += n


@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=8, deadline=None)
def test_ewma_bounded_by_window_extremes(spark, values):
    """EWMA is a convex combination of its lookback window, so every
    output lies within [min, max] of the last `lookback` values."""
    from weather4cast_bigdata_spark.operators.windows import ewma

    df = spark.createDataFrame(
        [(1, t, float(v)) for t, v in enumerate(values)], "k int, t int, value double"
    )
    out = {r["t"]: r["ewma"] for r in ewma(df, ["k"], "t", "value", lookback=8).collect()}
    for t in range(len(values)):
        window = values[max(0, t - 7) : t + 1]
        assert min(window) - 1e-5 <= out[t] <= max(window) + 1e-5


_QWORDS = ["a", "bb", "ccc", "the", "of", "with", "x#y", "....", "Mix", "zz9"]


@given(
    st.lists(
        st.lists(st.sampled_from(_QWORDS), min_size=1, max_size=40),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=6, deadline=None)
def test_dup_line_features_match_python(spark, docs_toks):
    """For ANY token stream the zero-shuffle run-length fold equals
    the obvious Counter-based line accounting (every copy of a
    duplicated line counted, chars weighted by line length)."""
    from collections import Counter

    from weather4cast_bigdata_spark.operators.curate_ext import dup_line_features

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dup_line_features(df, line_tokens=3).collect()}
    for i, toks in enumerate(docs_toks):
        tl = [t.lower() for t in toks]
        lines = [" ".join(tl[j : j + 3]) for j in range(0, len(tl), 3)]
        c = Counter(lines)
        dup_lines = sum(v for v in c.values() if v > 1)
        dup_chars = sum(v * len(ln) for ln, v in c.items() if v > 1)
        total_chars = sum(len(ln) for ln in lines)
        r = got[i]
        assert r.n_lines == len(lines)
        assert r.dup_lines == dup_lines
        assert r.dup_line_frac == dup_lines / len(lines)
        assert r.dup_line_char_frac == dup_chars / total_chars


@given(
    st.lists(
        st.lists(st.sampled_from(_QWORDS), min_size=1, max_size=40),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=6, deadline=None)
def test_top_ngram_char_frac_matches_python(spark, docs_toks):
    """The sorted-shingle argmax fold equals the Counter argmax with
    (count desc, shingle asc) tie-break for ANY token stream."""
    from collections import Counter

    from weather4cast_bigdata_spark.operators.curate_ext import top_ngram_char_frac

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in top_ngram_char_frac(df, n=2).collect()}
    for i, toks in enumerate(docs_toks):
        tl = [t.lower() for t in toks]
        r = got[i]
        if len(tl) < 2:
            assert r.top_ngram is None and r.top_tf == 0
            assert r.top_ngram_char_frac == 0.0
            continue
        c = Counter(tl[j] + " " + tl[j + 1] for j in range(len(tl) - 1))
        top, tf = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        n_chars = len(" ".join(tl))
        assert (r.top_ngram, r.top_tf) == (top, tf)
        assert r.top_ngram_char_frac == tf * len(top) / n_chars


@given(
    st.lists(
        st.lists(st.sampled_from(_QWORDS), min_size=1, max_size=60),
        min_size=1, max_size=12,
    )
)
@settings(max_examples=6, deadline=None)
def test_gopher_features_match_python(spark, docs_toks):
    """Every Gopher feature column equals the direct Python
    computation for ANY token stream (ratios are exact-int IEEE
    divisions, so equality is exact, not approximate)."""
    import re as _re

    from weather4cast_bigdata_spark.operators.curate_ext import (
        GOPHER_STOPWORDS,
        gopher_features,
    )

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs_toks)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_features(df).collect()}
    for i, toks in enumerate(docs_toks):
        text = " ".join(toks)
        tl = [t.lower() for t in toks]
        n = len(tl)
        r = got[i]
        assert r.n_words == n
        assert r.mean_word_len == sum(len(t) for t in tl) / n
        n_symbol = text.count("#") + len(_re.findall(r"\.\.\.", text))
        assert r.symbol_ratio == n_symbol / n
        assert r.alpha_frac == sum(1 for t in tl if _re.search("[a-z]", t)) / n
        assert r.stop_hits == len(set(tl) & set(GOPHER_STOPWORDS))
        assert r.keep == (
            35 <= n <= 100_000
            and 3.0 <= r.mean_word_len <= 10.0
            and r.symbol_ratio <= 0.1
            and r.alpha_frac >= 0.80
            and r.stop_hits >= 2
        )


@st.composite
def _corpora(draw):
    """Small random corpora over a 12-word vocab: short docs, heavy
    overlap, ties — the regime where a wrong prefix length or
    positional bound would drop a true pair."""
    n_docs = draw(st.integers(4, 12))
    docs = []
    for i in range(n_docs):
        words = draw(
            st.lists(st.sampled_from([f"w{k}" for k in range(12)]),
                     min_size=3, max_size=10)
        )
        docs.append((i, " ".join(words)))
    return docs


@given(_corpora(), st.sampled_from([0.3, 0.5, 0.8]))
@settings(max_examples=10, deadline=None)
def test_prefix_jaccard_lossless_for_any_corpus(spark, corpus, threshold):
    """AllPairs + PPJoin positional filter == brute-force Jaccard for
    ANY corpus and threshold (the exactness contract the operator
    sells; the filter may only ever admit extra CANDIDATES, never
    change the verified pair set)."""
    import itertools

    from pyspark.sql import functions as F

    from weather4cast_bigdata_spark.operators import dedup

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in dedup.prefix_filtered_jaccard_pairs(
            df, threshold=threshold
        ).collect()
    }
    hs = {
        r["doc_id"]: set(r["hs"])
        for r in df.select(
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
            if j >= threshold:
                want.add((a, b, round(j, 9)))
    assert got == want
