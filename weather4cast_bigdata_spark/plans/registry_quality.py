"""Round-4 curation-quality registry entries: the Gopher and C4 rule
batteries, line/n-gram repetition fractions, and canonical-URL dedup.

These complete the published quality-filter set next to
``text_quality_score`` / ``text_repetition_score`` (Rae et al. 2021
appendix A1; CommonCrawl URL screening). Not in the reference (raster
pipeline); first-class extensions per SURVEY.md §2's extension
families. Every query is a zero- or single-shuffle JVM-side plan with
a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from weather4cast_bigdata_spark.operators import curate_ext
from weather4cast_bigdata_spark.plans.registry import _t, qdef

_W = r"string_split_regex(trim(lower(text)), '\s+')"


@qdef(
    "text_gopher_rules",
    oracle=rf"""
    WITH f AS (
        SELECT doc_id, {_W} AS w,
               length(regexp_replace(text, '[^#]', '', 'g'))
                 + len(regexp_extract_all(text, '\.\.\.')) AS n_symbol
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               len(w) AS n_words,
               list_sum(list_transform(w, t -> length(t)))::DOUBLE / len(w)
                   AS mean_word_len,
               n_symbol::DOUBLE / len(w) AS symbol_ratio,
               len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::DOUBLE
                   / len(w) AS alpha_frac,
               len(list_intersect(w, ['the','be','to','of','and','that',
                                      'have','with'])) AS stop_hits
        FROM f
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           mean_word_len, symbol_ratio, alpha_frac,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           (n_words BETWEEN 35 AND 100000) AS ok_words,
           (mean_word_len BETWEEN 3.0 AND 10.0) AS ok_mean_len,
           (symbol_ratio <= 0.1) AS ok_symbol,
           (alpha_frac >= 0.80) AS ok_alpha,
           (stop_hits >= 2) AS ok_stop,
           ((n_words BETWEEN 35 AND 100000)
            AND (mean_word_len BETWEEN 3.0 AND 10.0)
            AND (symbol_ratio <= 0.1)
            AND (alpha_frac >= 0.80)
            AND (stop_hits >= 2)) AS keep
    FROM g
    """,
)
def q_text_gopher_rules(spark, sf_dir):
    """Gopher quality-rule battery (Rae et al. 2021 A1): word-count /
    mean-word-length / symbol-ratio / alphabetic-word / stopword
    screens as per-rule flags + conjunctive keep. Zero-shuffle narrow
    projection; ratios of exact ints emitted raw (policy #1)."""
    return curate_ext.gopher_features(_t(spark, sf_dir, "documents"))


@qdef(
    "text_dup_line_fraction",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, {_W} AS w,
               CAST(ceil(len({_W}) / 8.0) AS INT) AS n_lines
        FROM documents
    ),
    lines AS (
        SELECT doc_id, n_lines,
               array_to_string(w[(i*8+1):(i*8+8)], ' ') AS line
        FROM (SELECT doc_id, w, n_lines,
                     unnest(range(0, n_lines)) AS i
              FROM t)
    ),
    cnt AS (
        SELECT doc_id, max(n_lines) AS n_lines, line, count(*) AS c
        FROM lines GROUP BY doc_id, line
    )
    SELECT doc_id,
           CAST(max(n_lines) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_lines,
           sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / max(n_lines)
               AS dup_line_frac,
           sum(CASE WHEN c > 1 THEN c * length(line) ELSE 0 END)::DOUBLE
               / sum(c * length(line)) AS dup_line_char_frac
    FROM cnt GROUP BY doc_id
    """,
)
def q_text_dup_line_fraction(spark, sf_dir):
    """Gopher duplicate-line fraction + duplicate-line character
    fraction over deterministically synthesized 8-token lines (the
    fixture has no newlines; precedent: text_pii_redact's synthesized
    PII). Zero shuffles in Spark — sorted-line run-length fold; the
    oracle states the same numbers with explode + GROUP BY."""
    return curate_ext.dup_line_features(_t(spark, sf_dir, "documents"))


@qdef(
    "text_top_ngram_char_frac",
    oracle=rf"""
    WITH base AS (
        SELECT doc_id, {_W} AS w,
               length(trim(lower(text))) AS n_chars
        FROM documents
    ),
    sh AS (
        SELECT doc_id, n_chars,
               unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                     i -> w[i] || ' ' || w[i+1])) AS shingle
        FROM base
    ),
    tf AS (
        SELECT doc_id, max(n_chars) AS n_chars, shingle, count(*) AS tf
        FROM sh GROUP BY doc_id, shingle
    ),
    top AS (
        SELECT doc_id, shingle, tf, n_chars,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tf DESC, shingle) AS rn
        FROM tf
    )
    SELECT b.doc_id,
           t.shingle AS top_ngram,
           CAST(coalesce(t.tf, 0) AS BIGINT) AS top_tf,
           coalesce(t.tf * length(t.shingle) / b.n_chars::DOUBLE, 0.0)
               AS top_ngram_char_frac
    FROM base b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    """,
)
def q_text_top_ngram_char_frac(spark, sf_dir):
    """Gopher top-bigram character fraction: count × n-gram length /
    doc chars for the most frequent word bigram, ties to the
    lexicographically smallest. Zero shuffles — per-row sorted-shingle
    run-length argmax; the oracle's window-rank states the same
    tie-break with ORDER BY tf DESC, shingle."""
    return curate_ext.top_ngram_char_frac(_t(spark, sf_dir, "documents"), n=2)


# Deterministic synthetic URL per doc (the fixture has none): mixed
# case + www + tracking params + fragment so every canonicalization
# rule fires; path/query moduli make canonical collisions appear at
# scale (period lcm(2,3,50,7) = 1050 docs).
def _synth_url_spark():
    m3 = F.col("doc_id") % 3
    host = (
        F.when(m3 == 0, F.lit("Example.COM"))
        .when(m3 == 1, F.lit("data.example.org"))
        .otherwise(F.lit("crawl.net"))
    )
    return F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        host,
        F.lit("/p/"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit("?utm_source=feed&id="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref=rss#frag"),
    )


_SYNTH_URL_SQL = """
    'https://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
    || CASE doc_id % 3 WHEN 0 THEN 'Example.COM'
                       WHEN 1 THEN 'data.example.org'
                       ELSE 'crawl.net' END
    || '/p/' || CAST(doc_id % 50 AS VARCHAR)
    || '?utm_source=feed&id=' || CAST(doc_id % 7 AS VARCHAR)
    || '&ref=rss#frag'
"""


@qdef(
    "text_url_dedup",
    oracle=rf"""
    WITH synth AS (SELECT doc_id, {_SYNTH_URL_SQL} AS url FROM documents),
    s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM synth),
    s2 AS (
        SELECT doc_id,
               lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
                 || regexp_replace(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', '')
                 AS u
        FROM s1
    ),
    s3 AS (SELECT doc_id, regexp_replace(u, '://www\.', '://') AS u FROM s2),
    s4 AS (SELECT doc_id,
                  regexp_replace(u, '([?&])(utm_[A-Za-z0-9_]*|ref)=[^&#]*',
                                 '\1', 'g') AS u
           FROM s3),
    s5 AS (SELECT doc_id,
                  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                      u, '[?&]+$', ''), '\?&+', '?'), '&&+', '&', 'g'),
                      '/$', '') AS u
           FROM s4)
    SELECT u AS canonical_url,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           count(*) AS n_docs,
           regexp_extract(u, '^([a-z0-9+.-]+)://([^/?#]*)', 2) AS domain
    FROM s5 GROUP BY u
    """,
)
def q_text_url_dedup(spark, sf_dir):
    """Canonical-URL dedup (the CommonCrawl-style URL screen that
    runs before content hashing): lowercase authority, strip www.,
    drop fragment + utm_*/ref tracking params, strip trailing slash;
    keep min doc_id per canonical URL. One shuffle on the canonical
    URL (near-uniform key). URL is synthesized deterministically —
    the fixture has no URL column."""
    docs = _t(spark, sf_dir, "documents")
    return curate_ext.url_dedup(
        docs.select("doc_id", _synth_url_spark().alias("url"))
    )


# C4 rule battery (Raffel et al. 2020 §2.2 heuristics). The fixture
# text is punctuation-free word soup, so a deterministic sentence
# suffix per doc exercises both branches of every flag (precedent:
# text_pii_redact's synthesized PII): doc_id % 3 controls terminal
# punctuation, doc_id % 5 injects the blocklist tokens.
_C4_SYNTH_SQL = """
    text || CASE doc_id % 3
        WHEN 0 THEN '. Second sentence here. And a third one.'
        WHEN 1 THEN '. Short tail'
        ELSE ' no terminal punct' END
    || CASE doc_id % 5
        WHEN 0 THEN ' lorem ipsum filler'
        WHEN 1 THEN ' curly { brace'
        WHEN 2 THEN ' enable javascript now'
        ELSE '' END
"""


@qdef(
    "text_c4_rules",
    oracle=rf"""
    WITH synth AS (SELECT doc_id, {_C4_SYNTH_SQL} AS t FROM documents),
    f AS (
        SELECT doc_id, t,
               len(list_filter(string_split_regex(t, '[.!?]+'),
                               s -> trim(s) <> '')) AS n_sentences,
               (t LIKE '%lorem ipsum%') AS has_lorem,
               (t LIKE '%{{%') AS has_brace,
               contains(lower(t), 'javascript') AS has_js,
               (regexp_matches(trim(t), '[.!?]$')) AS ends_terminal
        FROM synth
    )
    SELECT doc_id,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           has_lorem, has_brace, has_js, ends_terminal,
           (n_sentences >= 3 AND NOT has_lorem AND NOT has_brace
            AND NOT has_js AND ends_terminal) AS keep
    FROM f
    """,
)
def q_text_c4_rules(spark, sf_dir):
    """C4 cleanup-rule battery (Raffel et al. 2020 §2.2): sentence
    count >= 3, terminal-punctuation ending, and the lorem-ipsum /
    curly-brace / javascript blocklist screens, as per-rule flags +
    conjunctive keep. Zero-shuffle narrow projection over the
    synthesized-suffix text (both branches of every flag live)."""
    docs = _t(spark, sf_dir, "documents")
    m3, m5 = F.col("doc_id") % 3, F.col("doc_id") % 5
    t = F.concat(
        F.col("text"),
        F.when(m3 == 0, F.lit(". Second sentence here. And a third one."))
        .when(m3 == 1, F.lit(". Short tail"))
        .otherwise(F.lit(" no terminal punct")),
        F.when(m5 == 0, F.lit(" lorem ipsum filler"))
        .when(m5 == 1, F.lit(" curly { brace"))
        .when(m5 == 2, F.lit(" enable javascript now"))
        .otherwise(F.lit("")),
    )
    from weather4cast_bigdata_spark.operators import curate_ext

    return curate_ext.c4_rules(docs.select("doc_id", t.alias("t")), text_col="t")


@qdef(
    "curation_quality_gate",
    oracle=rf"""
    WITH f AS (
        SELECT doc_id, {_W} AS w,
               length(regexp_replace(text, '[^#]', '', 'g'))
                 + len(regexp_extract_all(text, '\.\.\.')) AS n_symbol
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               len(w) AS n_words,
               list_sum(list_transform(w, t -> length(t)))::DOUBLE / len(w)
                   AS mean_word_len,
               n_symbol::DOUBLE / len(w) AS symbol_ratio,
               len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::DOUBLE
                   / len(w) AS alpha_frac,
               len(list_intersect(w, ['the','be','to','of','and','that',
                                      'have','with'])) AS stop_hits
        FROM f
    ),
    lt AS (
        SELECT doc_id, {_W} AS w,
               CAST(ceil(len({_W}) / 8.0) AS INT) AS n_lines
        FROM documents
    ),
    lines AS (
        SELECT doc_id, n_lines,
               array_to_string(w[(i*8+1):(i*8+8)], ' ') AS line
        FROM (SELECT doc_id, w, n_lines,
                     unnest(range(0, n_lines)) AS i
              FROM lt)
    ),
    cnt AS (
        SELECT doc_id, max(n_lines) AS n_lines, line, count(*) AS c
        FROM lines GROUP BY doc_id, line
    ),
    dl AS (
        SELECT doc_id,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END)::DOUBLE / max(n_lines)
                   AS dup_line_frac
        FROM cnt GROUP BY doc_id
    ),
    nb AS (
        SELECT doc_id, {_W} AS w,
               length(trim(lower(text))) AS n_chars
        FROM documents
    ),
    sh AS (
        SELECT doc_id, n_chars,
               unnest(list_transform(range(1, greatest(len(w) - 1, 0) + 1),
                                     i -> w[i] || ' ' || w[i+1])) AS shingle
        FROM nb
    ),
    tf AS (
        SELECT doc_id, max(n_chars) AS n_chars, shingle, count(*) AS tf
        FROM sh GROUP BY doc_id, shingle
    ),
    top AS (
        SELECT doc_id, shingle, tf, n_chars,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tf DESC, shingle) AS rn
        FROM tf
    ),
    tn AS (
        SELECT b.doc_id,
               coalesce(t.tf * length(t.shingle) / b.n_chars::DOUBLE, 0.0)
                   AS top_ngram_char_frac
        FROM nb b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    ),
    flags AS (
        SELECT g.doc_id,
               CAST(g.n_words AS BIGINT) AS n_words,
               dl.dup_line_frac, tn.top_ngram_char_frac,
               (dl.dup_line_frac <= 0.30) AS ok_dup_lines,
               (tn.top_ngram_char_frac <= 0.20) AS ok_top_ngram,
               (g.n_words BETWEEN 35 AND 100000) AS ok_words,
               (g.mean_word_len BETWEEN 3.0 AND 10.0) AS ok_mean_len,
               (g.symbol_ratio <= 0.1) AS ok_symbol,
               (g.alpha_frac >= 0.80) AS ok_alpha,
               (g.stop_hits >= 2) AS ok_stop
        FROM g JOIN dl USING (doc_id) JOIN tn USING (doc_id)
    )
    SELECT doc_id, n_words, dup_line_frac, top_ngram_char_frac,
           ok_dup_lines, ok_top_ngram, ok_words, ok_mean_len, ok_symbol,
           ok_alpha, ok_stop,
           (ok_words AND ok_mean_len AND ok_symbol AND ok_alpha AND ok_stop
            AND ok_dup_lines AND ok_top_ngram) AS keep,
           CASE WHEN NOT ok_words THEN 'word_count'
                WHEN NOT ok_mean_len THEN 'mean_word_len'
                WHEN NOT ok_symbol THEN 'symbol_ratio'
                WHEN NOT ok_alpha THEN 'alpha_frac'
                WHEN NOT ok_stop THEN 'stopwords'
                WHEN NOT ok_dup_lines THEN 'dup_lines'
                WHEN NOT ok_top_ngram THEN 'top_ngram'
                ELSE NULL END AS drop_reason
    FROM flags
    """,
)
def q_curation_quality_gate(spark, sf_dir):
    """The composed production quality gate: the full Gopher battery
    plus the paper's repetition thresholds (dup-line frac <= 0.30,
    top-bigram char frac <= 0.20) with per-rule flags, conjunctive
    keep, and the first-failing-rule drop_reason — all in ONE
    zero-shuffle projection (no joins between battery outputs; the
    oracle joins its CTEs because SQL has no run-length fold, which
    is exactly the shape the operator avoids)."""
    return curate_ext.curation_quality_gate(_t(spark, sf_dir, "documents"))


_DSIR_CTE = rf"""
    toks AS (
        SELECT doc_id, (lang = 'en') AS is_t,
               unnest({_W}) AS tok
        FROM documents
    ),
    bk AS (
        SELECT doc_id, is_t,
               CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 1024 AS b
        FROM toks
    ),
    stats AS (
        SELECT b, count(*) AS raw_n,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tgt_n
        FROM bk GROUP BY 1
    ),
    tot AS (SELECT sum(raw_n) AS raw_tot, sum(tgt_n) AS tgt_tot FROM stats),
    r AS (
        SELECT b, ln((tgt_n + 1.0) / (tgt_tot + 1024.0))
                 - ln((raw_n + 1.0) / (raw_tot + 1024.0)) AS lr
        FROM stats, tot
    ),
    w AS (
        SELECT t.doc_id, sum(r.lr) AS log_w, count(*) AS n_tokens
        FROM bk t JOIN r USING (b)
        GROUP BY 1
    )
"""


@qdef(
    "text_dsir_weights",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, round(log_w + 1e-9, 6) AS log_w, n_tokens
    FROM w
    """,
)
def q_text_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): per-doc log ratio of
    a hashed-token target model (lang='en' subset) over the raw-corpus
    model, add-1 smoothing over 1024 md5 buckets. Model state is 1024
    rows at ANY corpus size — bucket stats map-side-combine, the
    log-ratio dim broadcasts back, and the only full shuffle is the
    per-doc sum. See operators/curate_ext.py:dsir_log_weights."""
    from weather4cast_bigdata_spark.plans.registry import r6

    docs = _t(spark, sf_dir, "documents")
    out = curate_ext.dsir_log_weights(docs, F.col("lang") == "en")
    return out.select("doc_id", r6(F.col("log_w")).alias("log_w"), "n_tokens")


@qdef(
    "sample_dsir_resample",
    oracle=f"""
    WITH {_DSIR_CTE},
    s AS (
        SELECT doc_id, log_w, n_tokens,
               log_w - ln(-ln(
                   (CAST(('0x' || substring(md5('g_' || CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) + 0.5) / 4294967296.0)) AS score
        FROM w
    )
    SELECT doc_id, round(log_w + 1e-9, 6) AS log_w, n_tokens,
           round(score + 1e-9, 6) AS score
    FROM s
    ORDER BY score DESC, doc_id
    LIMIT 100
    """,
)
def q_sample_dsir_resample(spark, sf_dir):
    """The DSIR selection step: Gumbel-top-k resampling = k draws
    without replacement proportional to soft-maxed importance. Gumbel
    noise is md5-derived (no RNG state), so the selected set is
    identical across engines, retries, and partitionings. Plans as
    TakeOrderedAndProject — per-partition top-k, k-row reduce, no
    global sort. See operators/curate_ext.py:dsir_resample."""
    from weather4cast_bigdata_spark.plans.registry import r6

    docs = _t(spark, sf_dir, "documents")
    out = curate_ext.dsir_resample(docs, F.col("lang") == "en", k=100)
    return out.select(
        "doc_id",
        r6(F.col("log_w")).alias("log_w"),
        "n_tokens",
        r6(F.col("score")).alias("score"),
    )


@qdef(
    "sample_unimax",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, lang, len({_W}) AS n_tok
        FROM documents
    ),
    stats AS (SELECT lang, sum(n_tok) AS lang_toks FROM d GROUP BY 1),
    s AS (
        SELECT lang, lang_toks,
               lang_toks * 2.0 AS cap,
               sum(lang_toks) OVER () * 0.4 AS budget,
               coalesce(sum(lang_toks * 2.0) OVER (
                   ORDER BY lang_toks * 2.0, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
                   AS cum_before,
               row_number() OVER (ORDER BY lang_toks * 2.0, lang) AS idx,
               count(*) OVER () AS n
        FROM stats
    ),
    s2 AS (
        SELECT *,
               (cap < (budget - cum_before) / (n - idx + 1)) AS is_capped
        FROM s
    ),
    s3 AS (
        SELECT *,
               sum(CASE WHEN is_capped THEN 1 ELSE 0 END) OVER () AS n_capped,
               coalesce(sum(CASE WHEN is_capped THEN cap END) OVER (), 0.0)
                   AS capped_sum
        FROM s2
    ),
    rates AS (
        SELECT lang,
               (CASE WHEN is_capped THEN cap
                     ELSE (budget - capped_sum) / (n - n_capped) END)
                   / lang_toks AS epochs
        FROM s3
    )
    SELECT d.doc_id, d.lang, CAST(d.n_tok AS INT) AS n_tok,
           round(r.epochs + 1e-9, 6) AS epochs,
           ((CAST(('0x' || substring(md5('u_' || CAST(d.doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) + 0.5) / 4294967296.0
            < least(r.epochs, 1.0)) AS kept
    FROM d JOIN rates r USING (lang)
    """,
)
def q_sample_unimax(spark, sf_dir):
    """UniMax language sampling (Chung et al. 2023): water-filling a
    40% token budget across languages with a 2-epoch repetition cap —
    the published sequential allocation loop folded into one window
    pass over the languages-sized stats frame (see
    operators/curate_ext.py:unimax_sample for the closed form). Keep
    decisions are md5-threshold pure functions of the doc id."""
    from weather4cast_bigdata_spark.plans.registry import r6

    docs = _t(spark, sf_dir, "documents")
    out = curate_ext.unimax_sample(docs, budget_frac=0.4, max_epochs=2.0)
    return out.select(
        "doc_id", "lang", "n_tok", r6(F.col("epochs")).alias("epochs"), "kept"
    )


@qdef(
    "text_line_dedup_global",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        FROM documents
    ),
    lines AS (
        SELECT doc_id, i,
               array_to_string(w[i*8 + 1 : i*8 + 8], ' ') AS line
        FROM (SELECT doc_id, w,
                     unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS i
              FROM t)
    ),
    df AS (
        SELECT md5(line) AS lk, count(DISTINCT doc_id) AS line_df
        FROM lines GROUP BY 1
    ),
    kept AS (
        SELECT l.doc_id, l.i, l.line
        FROM lines l JOIN df ON md5(l.line) = df.lk
        WHERE df.line_df <= 1
    ),
    agg AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1),
    kagg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, ' ' ORDER BY i) AS clean
        FROM kept GROUP BY 1
    )
    SELECT a.doc_id, a.n_lines,
           coalesce(k.n_kept, 0) AS n_kept,
           coalesce(k.clean, '') AS clean
    FROM agg a LEFT JOIN kagg k USING (doc_id)
    """,
)
def q_text_line_dedup_global(spark, sf_dir):
    """Corpus-level line dedup (RefinedWeb/CCNet boilerplate removal):
    drop every line that appears in more than one distinct document,
    reassemble docs from the survivors in original order. The
    cross-document complement of the within-doc `text_dup_line_fraction`
    signal — exact-duplicate docs lose ALL their lines here, shared
    footers vanish everywhere. See
    operators/curate_ext.py:line_dedup_global."""
    return curate_ext.line_dedup_global(
        _t(spark, sf_dir, "documents"), line_tokens=8, max_df=1
    )


@qdef(
    "text_perplexity_buckets",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents
    ),
    freq AS (SELECT tok, count(*) AS tok_n FROM toks GROUP BY 1),
    total AS (SELECT sum(tok_n) AS tok_total FROM freq),
    lp AS (
        SELECT t.doc_id,
               round(avg(ln(f.tok_n * 1.0 / total.tok_total)) + 1e-9, 6)
                   AS mean_logprob
        FROM toks t JOIN freq f USING (tok), total
        GROUP BY 1
    ),
    b AS (
        SELECT d.doc_id, d.lang, lp.mean_logprob,
               ntile(3) OVER (PARTITION BY d.lang
                              ORDER BY lp.mean_logprob DESC, d.doc_id)
                   AS bucket_idx
        FROM lp JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, mean_logprob,
           CASE bucket_idx WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM b
    """,
)
def q_text_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity bucketing (Wenzek et al.
    2020): per LANGUAGE, rank documents by the corpus-LM fluency
    score (``text_unigram_logprob``'s mean ln p, the KenLM stand-in)
    and split into tertiles — 'head' is the most fluent third, the
    slice CCNet keeps or upsamples. The ntile runs over the ROUNDED
    score (desc, doc_id tie-break): rounding first makes the ordering
    engine-portable where raw float means are summation-order
    noisy. One lang-keyed window shuffle on top of the logprob plan;
    at 100 TB the tertile thresholds swap to approx_percentile cuts
    per language (same output contract, sketch-mergeable)."""
    from pyspark.sql import Window
    from weather4cast_bigdata_spark.functions import text as textfns
    from weather4cast_bigdata_spark.plans.registry import r6

    docs = _t(spark, sf_dir, "documents")
    lp = textfns.unigram_logprob(docs).select(
        "doc_id", r6(F.col("mean_logprob")).alias("mean_logprob")
    )
    scored = lp.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.desc("mean_logprob"), F.col("doc_id")
    )
    bucket = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "mean_logprob",
        F.when(bucket == 1, "head")
        .when(bucket == 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


@qdef(
    "sink_dsir_model",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc_id, round(log_w + 1e-9, 6) AS log_w, n_tokens
    FROM w
    WHERE doc_id % 5 = 0
    """,
)
def q_sink_dsir_model(spark, sf_dir):
    """Persisted-DSIR-model lifecycle: fit the 1024-row bucket
    log-ratio model on the full corpus, WRITE it to parquet, then
    score an incrementally-arriving batch (doc_id % 5 = 0) from the
    STORED model only — proving incremental scoring is hash-identical
    to the in-plan model (the oracle refits on the full corpus). At
    100 TB the fitted corpus is read once ever; each new batch costs
    one narrow pass + a ~16 KB broadcast. Same lifecycle contract as
    sink_lsh_index / sink_ivfpq_index."""
    from weather4cast_bigdata_spark.plans.registry import r6, scratch_dir

    docs = _t(spark, sf_dir, "documents")
    model_path = scratch_dir("w4c_dsir_model")
    curate_ext.dsir_bucket_model(docs, F.col("lang") == "en").write.mode(
        "overwrite"
    ).parquet(model_path)
    stored = spark.read.parquet(model_path)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    out = curate_ext.dsir_score(batch, stored)
    return out.select("doc_id", r6(F.col("log_w")).alias("log_w"), "n_tokens")


#: SimHash block-depth target: the adaptive signature width holds
#: E[docs per (block, value) bucket] — and with it the candidate
#: join's per-doc output — roughly constant as the corpus grows.
#: r10 (VERDICT item 3): resolution is FRACTIONAL AT 1-BIT STEPS —
#: total signature bits B ∈ [24, 60] need not divide by 3; the
#: first B % 3 blocks carry one extra bit, so candidate volume
#: Σ_j n²/2^(w_j) interpolates in ~2^(1/3) ≈ 1.26× steps instead of
#: the whole-block 2× sawtooth (the 9.4×/decade term). The capacity
#: thresholds solve Σ_j n/2^(w_j) ≤ 3·TARGET for B = 3w + r:
#: n ≤ 192·2^(w+1)/(6-r). B = 24 is the legacy floor — its cap is
#: 64·2^8 = 16384 docs, so both bench gates (≤ 8192 docs) keep the
#: original 24-bit signature and its recorded results bit-for-bit.
SIMHASH_BLOCK_TARGET = 64
SIMHASH_MAX_BITS = 60  # the md5_hash60 signature limit
SIMHASH_MIN_BITS = 24  # the legacy floor (3 x 8-bit blocks)


def _simhash_cap(bits: int) -> int:
    """Largest corpus the B-bit 3-block signature holds at the depth
    target: floor(192 · 2^(w+1) / (6 - r)), B = 3w + r."""
    w, r = divmod(bits, 3)
    return (SIMHASH_BLOCK_TARGET * 3 * (1 << (w + 1))) // (6 - r)


def _simhash_bits(n: int) -> int:
    """Smallest B in [24, 60] whose capacity covers ``n`` (saturates
    at 60 — cap 64·2²¹ ≈ 134 M docs at target 64; past that the
    max_bucket census cap is the documented guard). Pure integer
    comparisons
    over Python-literal thresholds, so the SQL oracle restates the
    identical chain over the identical count."""
    bits = SIMHASH_MIN_BITS
    for b in range(SIMHASH_MIN_BITS, SIMHASH_MAX_BITS):
        if n > _simhash_cap(b):
            bits = b + 1
    return bits


def _simhash_bits_sql(count_sql: str) -> str:
    """SQL restatement of :func:`_simhash_bits`: cap thresholds are
    monotone in B, so B = 24 + #{b ∈ [24, 60) : n > cap(b)} — the
    same integer-comparison chain shape as every adaptive knob,
    chunked in 32-term groups under DuckDB's expression-nesting
    limit."""
    terms = [
        f"(CASE WHEN c > {_simhash_cap(b)} THEN 1 ELSE 0 END)"
        for b in range(SIMHASH_MIN_BITS, SIMHASH_MAX_BITS)
    ]
    chunks = [
        "(" + " + ".join(terms[i : i + 32]) + ")"
        for i in range(0, len(terms), 32)
    ]
    return (
        f"(SELECT {SIMHASH_MIN_BITS} + {' + '.join(chunks)}"
        f" FROM (SELECT ({count_sql}) AS c))"
    )


def _simhash_adaptive_cte() -> str:
    """Adaptive-width SimHash CTE: total signature bits B from the
    same 1-bit-step integer-comparison chain the Spark plan derives
    from count(*) (:func:`_simhash_bits`), signature = 3 blocks of
    B//3 (+1 for the first B%3) bits — block j covers the slice
    [j·(B//3) + least(j, B%3), +w_j), the identical layout
    arithmetic as the LSH band oracles. The per-token hash source
    follows the width: md5-first-8-hex (the legacy 32-bit hash)
    while B ≤ 32 — keeping every recorded ≤32-bit result stable —
    else md5-first-15-hex (60-bit). Bit sums are emitted for all 60
    positions; compose gates each on b < B, so both engines read
    the identical signature at every corpus size."""
    from weather4cast_bigdata_spark.plans.registry import _H32_SQL, _TOKS_SQL

    b_chain = _simhash_bits_sql("SELECT count(*) FROM documents")
    h60 = "CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT)"
    bit_sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS bit_{b}"
        for b in range(60)
    )
    compose = " + ".join(
        f"CASE WHEN {b} < (SELECT bits FROM bitv) AND bit_{b} > 0"
        f" THEN {1 << b}::BIGINT ELSE 0 END"
        for b in range(60)
    )
    # fractional block layout from the scalar B: w_j = B//3 + (j < B%3)
    off = "(j * ((SELECT bits FROM bitv) // 3) + least(j, (SELECT bits FROM bitv) % 3))"
    w_j = "(((SELECT bits FROM bitv) // 3) + (CASE WHEN j < (SELECT bits FROM bitv) % 3 THEN 1 ELSE 0 END))"
    return f"""
    bitv AS (SELECT {b_chain} AS bits),
    toks AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents
    ),
    hashed AS (
        SELECT doc_id,
               CASE WHEN (SELECT bits FROM bitv) <= 32
                    THEN {_H32_SQL.format(expr='tok')}
                    ELSE {h60} END AS h
        FROM toks
    ),
    bits AS (SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id),
    sig AS (SELECT doc_id, {compose} AS simhash FROM bits),
    blocks AS (
        SELECT doc_id, simhash, j,
               (simhash >> {off}) & ((1::BIGINT << {w_j}) - 1) AS bv
        FROM sig, unnest([0, 1, 2]) AS t(j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_id_l, b.doc_id AS doc_id_r,
               a.simhash AS s1, b.simhash AS s2
        FROM blocks a
        JOIN blocks b ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    """


@qdef(
    "dedup_simhash_hamming",
    oracle=f"""
    WITH {_simhash_adaptive_cte()}
    SELECT doc_id_l, doc_id_r,
           bit_count(xor(s1, s2)) AS hamming
    FROM cand
    WHERE bit_count(xor(s1, s2)) <= 2
    """,
)
def q_dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-duplicate pairs at Hamming distance <= 2 (Manku
    et al. 2007, the Google web-crawl dedup): pigeonhole the
    signature into 3 blocks — any pair at distance <= 2 agrees
    exactly on >= 1 block — so candidates come from an equi self-join
    per block (one shuffle), verified in-row with bit_count(xor).
    Lossless at the threshold; sim_hyperplane_lsh's identical-
    signature pairing is the distance-0 special case. r9 made the
    width SCALE-ADAPTIVE (Manku's own scale knob: wider signatures,
    not a recall-losing bucket cap) so E[docs per block bucket] —
    and with it the candidate join's per-doc output — stays
    ~constant as the corpus grows instead of the measured quadratic
    blowup of a fixed 24-bit signature. r10 (VERDICT item 3): the
    resolution moves in 1-BIT steps — total bits B from a capacity
    chain solving Σ_j n/2^(w_j) ≤ 3·64, blocks of B//3 (+1 for the
    first B%3) bits — so candidate volume steps ~1.26× per bit
    instead of the whole-block 2× sawtooth (9.4×/decade measured);
    and the corpus count comes from parquet FOOTER metadata, not a
    count job — the ≤ 8192-doc plan (both bench gates, B = 24) is
    byte-identical to the r8 plan again (the r9 count pass was the
    +38 % sf0.1 regression). The per-token hash widens from
    md5-first-8-hex to md5-first-15-hex only when B > 32; chain,
    layout, and hash switch are restated 1:1 in the oracle. See
    operators/dedup.py:simhash_near_pairs."""
    from weather4cast_bigdata_spark.operators import dedup
    from weather4cast_bigdata_spark.sources.catalog import table_rows

    docs = _t(spark, sf_dir, "documents")
    bits = _simhash_bits(table_rows(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs(
        docs, bits=bits, k=2, hash_bits=32 if bits <= 32 else 60
    )
