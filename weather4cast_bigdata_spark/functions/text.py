"""Text-analysis column functions for the training-data-pipeline layer.

Not present in the reference (it is a raster pipeline); these are the
first-class extensions the engine adds for LLM-scale data curation:
tokenization, shingling, deterministic 64/32-bit hashing that a SQL
oracle can reproduce, language-ID and quality heuristics, and a
position-weighted document fingerprint. Everything is a JVM-side
expression — at 100 TB these run inside whole-stage codegen with no
Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Word tokenizer: split on runs of non-word chars.
TOKEN_SPLIT_RE = r"\s+"
# BPE-ish subword-ish regex: word pieces OR digits OR punctuation runs.
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string>.

    Convention: an empty/whitespace-only document tokenizes to
    ``[""]`` (size 1), matching the SQL oracle's
    ``string_split_regex`` exactly — every token-count/shingle/hash
    expression relies on the two engines agreeing on this edge, so do
    NOT filter the empty string here without changing every oracle.
    """
    return F.split(F.trim(text), TOKEN_SPLIT_RE)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex (letters / digit runs /
    punct runs counted separately)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), F.lit(0)))


def md5_hash64(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex digits of md5.

    Chosen over ``xxhash64`` because the DuckDB oracle can reproduce
    it exactly (md5 is identical in both engines)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_hash32(col: Column) -> Column:
    """Deterministic 32-bit integer hash: first 8 hex digits of md5."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def md5_hash60(col: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex digits of md5
    — the wide twin of :func:`md5_hash32` for signatures whose bit
    count outgrows 32 (e.g. the scale-adaptive SimHash width).
    DuckDB restatement: CAST(('0x' || substring(md5(x), 1, 15)) AS
    BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-gram word shingles from a token array → array<string>.

    The token expression is BOUND ONCE per row by wrapping it in a
    1-element array and shingling inside the ``transform`` lambda —
    the lambda variable is the evaluated array, so however many
    times the shingle body references it, the (expensive) tokenizer
    runs exactly once, regardless of what expression the caller
    passes. A naive transform+element_at over the raw expression
    captures the tokenizer inside the lambda and re-tokenizes the
    document once per shingle (measured 45× slower at sf1); the
    previous zip_with-over-shifted-slices form evaluated the tokens
    once per slice and built n intermediate arrays per row
    (measured 2.7× slower). ``element_at`` is O(1) per probe, one
    ``concat_ws`` per shingle, no intermediate arrays. Empty result
    if fewer than ``n`` tokens (``sequence`` would count DOWN for
    start > stop, so the short-doc branch is explicit)."""

    def shingle(tk: Column) -> Column:
        sz = F.size(tk)
        return F.when(
            sz >= n,
            F.transform(
                F.sequence(F.lit(1), sz - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + k) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(toks), shingle))


# --- language ID ------------------------------------------------------------

# Tiny marker lexicons (n-gram heuristic stand-in). Deterministic and
# SQL-reproducible; real deployments would swap in fastText via a
# Pandas UDF at the same call site.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "de", "que", "una"],
}


def _marker_hits(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def lang_id(text: Column) -> Column:
    """Argmax of marker-word hits; 'und' (undetermined) when no hits.

    Ties break by language-code order (deterministic, matches the SQL
    oracle's CASE chain).
    """
    toks = tokens(F.lower(text))
    hits = {code: _marker_hits(toks, markers) for code, markers in sorted(LANG_MARKERS.items())}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for code in sorted(LANG_MARKERS, reverse=True):
        expr = F.when((hits[code] == best) & (best > 0), F.lit(code)).otherwise(expr)
    return expr


# --- quality scoring --------------------------------------------------------

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punct-ratio / stopword-ratio features.

    Returns named columns so callers can select any subset.
    """
    toks = tokens(F.lower(text))
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    # try_divide: a zero-length document must yield a NULL punct
    # ratio, not kill the job under ANSI mode (one empty doc in a
    # 100 TB corpus would otherwise fail the whole stage). n_tok is
    # never 0 (tokens("") == [""]), so the token-ratio guards are
    # belt-and-suspenders only.
    return {
        "n_tokens": n_tok,
        "n_chars": n_chars,
        "punct_ratio": F.try_divide(n_punct.cast("double"), n_chars),
        "stopword_ratio": F.try_divide(n_stop.cast("double"), n_tok),
        "mean_token_len": F.try_divide((n_chars - n_tok + 1).cast("double"), n_tok),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length docs with
    a healthy stopword ratio, penalizes punctuation soup."""
    f = quality_features(text)
    length_term = F.least(f["n_tokens"].cast("double") / F.lit(50.0), F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * F.lit(5.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(1.0) - f["punct_ratio"] * F.lit(10.0), F.lit(0.0))
    return (length_term + stop_term + punct_pen) / F.lit(3.0)


# --- fingerprinting ---------------------------------------------------------


FINGERPRINT_MOD = 2_305_843_009_213_693_951  # 2^61 - 1 (Mersenne)


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: Σ h32(token_i)·i over
    1-based positions, reduced mod 2^61−1 — the deterministic
    stand-in for a rolling Rabin hash.

    The per-step mod keeps the accumulator overflow-safe at any
    document length (term ≤ 2^52, acc < 2^61, sum < 2^63; an
    unreduced Σ overflows int64 around 100k tokens and ANSI mode
    kills the stage). Mod distributes over addition, so the oracle's
    ``sum(term) % M`` (DuckDB sums BIGINT into HUGEINT — no overflow
    there) matches bit-exactly.
    """
    terms = F.transform(
        tokens(text),
        lambda x, i: md5_hash32(x) * (i + F.lit(1)).cast("bigint"),
    )
    return F.aggregate(
        terms,
        F.lit(0).cast("bigint"),
        lambda acc, v: F.pmod(acc + v, F.lit(FINGERPRINT_MOD)),
    )


def unigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean unigram log-probability against the corpus's
    own unigram distribution — the frequency-based fluency proxy
    (KenLM-style perplexity stand-in) corpus filters rank documents
    by: boilerplate of common words scores high, gibberish of rare
    tokens scores low.

    Two aggregations over one token explode: the unigram-frequency
    table (map-side combined; vocabulary-sized, broadcast back) and
    the per-doc mean of ``ln(count(tok)/total)``. Every token is in
    its own corpus by construction, so the log never sees zero. At
    100 TB the frequency dim is the only reused state — persist it
    and score incrementally arriving documents against it.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tok_n"))
    total = freq.agg(F.sum("tok_n").alias("tok_total"))
    scored = (
        toks.join(F.broadcast(freq), on="tok")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), F.log(F.col("tok_n") / F.col("tok_total")).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.avg("lp").alias("mean_logprob"), F.count(F.lit(1)).alias("n_tokens")
    )


def bigram_logprob(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document mean bigram conditional log-probability
    ``avg ln c(w1 w2)/c(w1·)`` against the corpus's own bigram
    distribution — one order up from ``unigram_logprob``: it scores
    word ORDER, so shuffled or template-stitched text ranks below
    natural prose even when its word frequencies look fine (the
    KenLM-style fluency proxy at n=2).

    Shape mirrors ``unigram_logprob``: bigrams form map-side
    (``word_shingles`` at n=2 — no self-join on position), one
    explode, two vocabulary-sized frequency dims broadcast back, one
    per-doc aggregation. Docs with fewer than 2 tokens have no
    bigrams and drop out, matching the oracle. Every bigram is in its
    own corpus, so the log never sees zero.
    """
    toks = tokens(F.col(text_col))
    d = docs.select(
        F.col(id_col), F.explode(word_shingles(toks, 2)).alias("bg")
    ).withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
    c2 = d.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    c1 = d.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        d.join(F.broadcast(c2), on="bg")
        .join(F.broadcast(c1), on="w1")
        .select(F.col(id_col), F.log(F.col("c2") / F.col("c1")).alias("lp"))
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("lp") + F.lit(1e-9), 6).alias("mean_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def tfidf_topk(docs, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Per-document top-k TF-IDF terms — the keyword-extraction /
    relevance-weighting primitive corpus search and topic filters are
    built on. ``tfidf = (tf/|doc|) · ln(N/df)``; ranking uses the
    cross-engine-stable rounded score (9 decimals, +1e-12 tie nudge —
    ln differs by ulps between JVM and libm) with a term-ascending
    tie-break, so the kept set is bit-identical in any engine.

    Shuffle profile — ONE corpus scan, three tf-table-sized shuffles,
    no join: the document length RIDES the explode (computed once per
    row, pre-shuffle — same trick as ``ngram_jaccard_pairs_docs``);
    document frequency is a count-window over the term key of the
    already-aggregated (doc, term) table rather than a second
    tokenize-and-aggregate pass (tokenization is the CPU-heavy stage
    at 100 TB — it must run once); the per-doc rank re-shuffles only
    the tf table. N rides a 1-row broadcast.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ts = tokens(F.lower(F.col(text_col)))
    toks = docs.select(
        F.col(id_col), F.size(ts).alias("n_tok"), F.explode(ts).alias("term")
    )
    tf = toks.groupBy(id_col, "n_tok", "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                (F.col("tf") / F.col("n_tok")) * F.log(F.col("n_docs") / F.col("df"))
                + F.lit(1e-12),
                9,
            ),
        )
    )
    rank_w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


# PII patterns kept RE2/Java-portable (no lookaround) so the same
# pattern string runs in Spark, DuckDB, and a Go/Rust scrubber.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}\b"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(text: Column) -> Column:
    """Replace emails / phone-shaped numbers / IPv4 literals with
    typed placeholders — the pre-release scrub every public-corpus
    pipeline runs. Pure chained ``regexp_replace`` (codegen'd, no
    Python); email first so its digits can't be half-eaten by the
    phone pass. A production scrubber adds NER-based name redaction
    as a Pandas-UDF stage at the same call site.
    """
    out = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE_RE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4_RE, "<IP>")


def strip_markup(text: Column) -> Column:
    """Drop HTML/XML tags and collapse whitespace — the boilerplate
    scrub ahead of tokenization in web-corpus pipelines. Pure regexp
    projection (codegen'd, no Python); entity decoding and boilerplate
    extraction (readability-style) belong in a Pandas-UDF stage when a
    real HTML parser is available."""
    no_tags = F.regexp_replace(text, r"<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))
