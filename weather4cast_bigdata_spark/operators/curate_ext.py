"""Wave-3 curation operators: decontamination, mixture sampling,
sequence packing, repetition scoring.

Not in the reference (raster pipeline; cf. SURVEY.md §2 extension
families) — these complete the standard large-scale training-data
pipeline: benchmark decontamination (n-gram overlap against a held-out
eval set, the GPT-3/PaLM appendix procedure), deterministic per-source
mixture sampling (data-mixture reweighting), concat-and-chunk sequence
packing (the fixed-context packing every LLM trainer applies), and
Gopher-style within-document repetition signals.

Everything is md5-deterministic so the DuckDB oracle reproduces
results bit-exactly, and every shape is single-shuffle or narrow —
the 100 TB disposition per operator is in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions.text import md5_hash32, tokens, word_shingles
from weather4cast_bigdata_spark.operators.dedup import doc_shingle_hashes
from weather4cast_bigdata_spark.partitioning import ensure_min_parallelism


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Flag training documents sharing ≥ ``min_overlap`` distinct
    word-``n``-gram shingles with any document in a held-out eval set.

    This is the published benchmark-decontamination recipe (n-gram
    collision against the eval suite). Shape: both sides shingle to
    32-bit hashes map-side; the eval shingle set is ``distinct``-ed
    and **broadcast** — eval suites are thousands of documents while
    the training corpus is the 100 TB side, so the join is a
    broadcast-hash semi-probe with NO shuffle of the big side. The
    only exchange is the per-doc overlap count (8-byte keys).

    Returns every training doc: (id, n_overlap, contaminated).
    """
    train_sh = doc_shingle_hashes(train, id_col=id_col, text_col=text_col, n=n)
    eval_sh = (
        doc_shingle_hashes(eval_docs, id_col=id_col, text_col=text_col, n=n)
        .select("h32")
        .distinct()
    )
    overlap = (
        train_sh.join(F.broadcast(eval_sh), on="h32")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        train.select(id_col)
        .join(overlap, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) >= F.lit(min_overlap)).alias(
                "contaminated"
            ),
        )
    )


def priority_sample(
    docs: DataFrame,
    k: int,
    weight: "F.Column",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement via priority sampling
    (Duffield–Lund–Thorup): per row, priority ``q = w / u`` with
    ``u = (md5_32(id) + 0.5) / 2^32``; keep the top-``k`` priorities
    and attach the Horvitz–Thompson estimator weight
    ``max(w, τ)`` where τ is the (k+1)-th priority — subset-sum
    estimates over the sample are unbiased for the population.

    Determinism across engines: every arithmetic step is an IEEE-754
    correctly-rounded operation (add, divide by a power of two,
    divide) on identical inputs, so the priorities — and therefore
    the selected set — are bit-identical in Spark and the DuckDB
    oracle, with ties broken by id. No RNG state: stable under task
    retries and cluster resizing, which ``rand()``-based weighted
    sampling is not.

    Scale: top-(k+1) by priority compiles to TakeOrderedAndProject —
    per-partition partial top-k then a single k-row reduce at the
    driver stage, NO global sort, NO full shuffle; the window rank
    afterwards runs over k+1 rows. Linear scan of the corpus, O(k)
    state.
    """
    u = (md5_hash32(F.col(id_col).cast("string")) + F.lit(0.5)) / F.lit(
        float(1 << 32)
    )
    pri = docs.select(
        F.col(id_col),
        weight.cast("double").alias("w"),
        (weight.cast("double") / u).alias("priority"),
    )
    top = pri.orderBy(F.desc("priority"), F.col(id_col)).limit(k + 1)
    w_rank = Window.orderBy(F.desc("priority"), F.col(id_col))
    ranked = top.select(
        "*", F.row_number().over(w_rank).alias("_rk")
    )
    # 1-row always (τ = 0 when the population has ≤ k rows, making
    # est_weight = w — the exhaustive-sample case).
    tau = ranked.agg(
        F.coalesce(
            F.min(F.when(F.col("_rk") == k + 1, F.col("priority"))),
            F.lit(0.0),
        ).alias("_tau")
    )
    return (
        ranked.where(F.col("_rk") <= k)
        .crossJoin(F.broadcast(tau))
        .select(
            F.col(id_col),
            F.col("w").alias("weight"),
            F.round(F.col("priority"), 6).alias("priority"),
            F.round(F.greatest("w", "_tau"), 6).alias("est_weight"),
        )
    )


def decontaminate_bloom(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 2,
    m_bits: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the scale path for
    when even the *eval* shingle set is too large to broadcast raw.

    ``decontaminate`` broadcasts the distinct eval shingle hashes;
    fine for thousands of benchmark docs, but a consortium eval
    suite (or decontaminating corpus A against corpus B) can carry
    billions of shingles. This variant folds the eval side into a
    Bloom filter of ``m_bits`` positions: per shingle, ``k``
    independent 32-bit slices of its md5 digest, each mod ``m_bits``.
    The broadcast side is then the distinct SET-BIT positions —
    bounded by ``m_bits`` (≤ 2^18 rows ≈ 2 MB) **no matter how large
    the eval corpus grows**. The training side computes its ``k``
    slice positions as COLUMNS of each (doc, shingle) row and chains
    ``k`` LEFT SEMI broadcast-hash probes against that table (no
    O(m) membership scan per row, no shuffle and no k× row explode
    of the 100 TB side); a shingle "hits" iff it survives the whole
    chain — all ``k`` positions set — and a doc is flagged at
    ≥ ``min_overlap`` hitting shingles.

    One-sided error: Bloom membership has false positives only, so
    ``contaminated`` here is a superset of the exact operator's flag
    — the safe direction for decontamination (never ships an eval
    doc; over-drops at the documented FPR ≈ (1-e^{-kn/m})^k). The
    md5-slice position derivation is engine-portable, so the DuckDB
    oracle reproduces the filter bit-exactly, FPs included.

    Returns (id, n_overlap_bloom, contaminated) for every training
    doc.
    """

    def shingle_md5(docs: DataFrame) -> DataFrame:
        sh = word_shingles(tokens(F.col(text_col)), n)
        return ensure_min_parallelism(docs).select(
            F.col(id_col),
            F.explode(F.array_distinct(F.transform(sh, F.md5))).alias("h"),
        )

    def slice_pos(j):
        return F.conv(F.substring("h", 1 + 8 * j, 8), 16, 10).cast(
            "bigint"
        ) % F.lit(m_bits)

    # Eval side: k slice positions per distinct shingle, folded to the
    # distinct SET-BIT position table (≤ m_bits rows by construction).
    eval_bits = (
        shingle_md5(eval_docs)
        .select(F.explode(F.array(*[slice_pos(j) for j in range(k)])).alias("pos"))
        .distinct()
    )
    # Train side (r11 restructure, guide §2.3/§2.4): the previous form
    # posexploded every train shingle to k position ROWS (k× the probe
    # volume), broadcast-joined, then needed a corpus-keyed
    # groupBy(id, h) + countDistinct(j) exchange AND a second
    # groupBy(id) exchange to undo the explode. "All k positions set"
    # is instead tested IN-ROW: the k positions are computed as
    # columns of the one (id, shingle) row and each probes the same
    # broadcast bit table with a LEFT SEMI broadcast-hash join — a
    # shingle survives the chain iff every slice position is set,
    # exactly countDistinct(j) = k of the exploded form (positions
    # are per-(doc, shingle) constants, so conjunction of k semi
    # probes ⟺ all k hit). No train-side row multiplication, no
    # (id, h) exchange: the only shuffle left is the map-combined
    # per-doc count — at web scale the difference between exchanging
    # every hitting (shingle, j) row and exchanging one partial count
    # per (task, doc).
    probe = shingle_md5(train).select(
        F.col(id_col), *[slice_pos(j).alias(f"_p{j}") for j in range(k)]
    )
    for j in range(k):
        probe = probe.join(
            F.broadcast(eval_bits.withColumnRenamed("pos", f"_p{j}")),
            on=f"_p{j}",
            how="left_semi",
        )
    overlap = probe.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_overlap_bloom")
    )
    return (
        train.select(id_col)
        .join(overlap, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_overlap_bloom"), F.lit(0)).alias(
                "n_overlap_bloom"
            ),
            (
                F.coalesce(F.col("n_overlap_bloom"), F.lit(0))
                >= F.lit(min_overlap)
            ).alias("contaminated"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.1,
    id_col: str = "doc_id",
    source_col: str = "source",
    resolution: int = 10_000,
) -> DataFrame:
    """Deterministic per-source downsampling to a target data mixture.

    Each doc's keep decision is ``md5(id) mod resolution <
    rate·resolution`` — a pure narrow projection (no RNG state, no
    shuffle, reproducible across engines and cluster sizes, stable
    under re-runs and retries — the property ``rand()`` sampling lacks
    on a 1000-executor job with task retries). The inverse-rate
    ``weight`` column makes downstream statistics unbiased
    (Horvitz-Thompson).
    """
    rate = F.lit(float(default_rate))
    for src, r in sorted(rates.items()):
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    bucket = F.pmod(md5_hash32(F.col(id_col).cast("string")), F.lit(resolution))
    return (
        docs.withColumn("_rate", rate)
        .where(bucket < F.col("_rate") * resolution)
        .withColumn("weight", F.round(F.lit(1.0) / F.col("_rate"), 6))
        .drop("_rate")
    )


def pack_chunked(
    docs: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in
    ``id`` order into one global token stream, split into
    fixed-``capacity`` training sequences; each doc reports the global
    offset and the pack range it spans — exactly the layout a
    fixed-context LLM trainer consumes.

    The global prefix sum is the scale hazard: a bare
    ``Window.orderBy(id)`` collapses to ONE partition. Instead the
    classic distributed two-pass: (1) bucket by id range (span from a
    1-row max-id aggregate), per-bucket cumulative sums in parallel;
    (2) per-bucket totals — ``n_buckets`` rows — prefix-summed on the
    tiny side and broadcast back as bucket offsets. Wall-clock is one
    narrow pass + one ``n_buckets``-row exchange regardless of corpus
    size. (Caveat: buckets follow the id range, so a sparse id space
    skews bucket sizes — acceptable for monotone ingest ids; re-key
    first if ids are adversarial.)

    Returns (id, n_tok, start_offset, pack_first, pack_last).
    """
    d = ensure_min_parallelism(docs).select(
        F.col(id_col), F.size(tokens(F.col(text_col))).alias("n_tok")
    )
    max_id = d.agg(F.max(id_col).alias("_max_id"))
    span = F.floor(F.col("_max_id") / n_buckets) + 1
    d = d.crossJoin(F.broadcast(max_id)).withColumn(
        "_bucket", F.floor(F.col(id_col) / span).cast("int")
    ).drop("_max_id")
    # ONE bucket exchange + persist at the branch point: the cached
    # (id, n_tok, bucket) table is ~24 bytes/doc and keeps its hash
    # partitioning, so BOTH consumers (in-bucket window, bucket-totals
    # agg) read it with no further exchange — without it each branch
    # re-tokenizes the full corpus (column pruning diverges the
    # branch plans, so ReuseExchange never fires).
    d = d.repartition(n_buckets, "_bucket").persist()

    in_bucket = Window.partitionBy("_bucket").orderBy(id_col)
    cum = d.withColumn("_cum_in", F.sum("n_tok").over(in_bucket))

    # n_buckets rows — the only cross-bucket data movement
    prior = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        d.groupBy("_bucket")
        .agg(F.sum("n_tok").alias("_tot"))
        .withColumn("_offset", F.coalesce(F.sum("_tot").over(prior), F.lit(0)))
        .select("_bucket", "_offset")
    )
    d = cum

    start = F.col("_offset") + F.col("_cum_in") - F.col("n_tok")
    return (
        d.join(F.broadcast(offsets), on="_bucket")
        .select(
            F.col(id_col),
            F.col("n_tok"),
            start.alias("start_offset"),
            F.floor(start / capacity).alias("pack_first"),
            F.floor((start + F.col("n_tok") - 1) / capacity).alias("pack_last"),
        )
    )


def chunk_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping token-window chunking — the RAG/embedding prep
    step that splits long documents into ``chunk_tokens``-token
    windows every ``stride`` tokens (tail window kept, so every
    token lands in ≥1 chunk; overlap = chunk − stride tokens of
    context carry-over).

    Pure narrow projection: chunk starts come from a per-row
    ``sequence``, the slice+join runs inside higher-order functions —
    no explode-then-window, no shuffle; output rows = ~n_tok/stride
    per doc. Returns (id, chunk_idx, n_chunk_tokens, chunk_text).
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # start positions 1, 1+stride, ... over ceil(max(n-chunk,0)/stride)+1 windows
    n_chunks = F.floor(
        (F.greatest(n - chunk_tokens, F.lit(0)) + stride - 1) / stride
    ) + 1
    starts = F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    d = ensure_min_parallelism(docs).select(
        F.col(id_col),
        toks.alias("_t"),
        F.explode(starts).alias("chunk_idx"),
    )
    piece = F.slice(F.col("_t"), F.col("chunk_idx") * stride + 1, chunk_tokens)
    return d.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals: fraction of
    tokens belonging to the most frequent token, and the duplicate
    fraction (1 − distinct/total). High values flag boilerplate /
    template spam for removal.

    ZERO shuffles: instead of explode + two groupBys (which would
    shuffle the exploded token stream), each document's sorted token
    array is folded in one ``aggregate`` run-length scan computing
    max-run (= max term frequency) and distinct count per row — a
    narrow, fully codegen'd projection that scales embarrassingly.
    Ratios are cross-engine-rounded (policy #3).
    """
    toks = tokens(F.lower(F.col(text_col)))
    srt = F.array_sort(toks)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("maxrun"),
        F.lit(0).alias("ndist"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["maxrun"], run).alias("maxrun"),
            F.when(x.eqNullSafe(acc["prev"]), acc["ndist"])
            .otherwise(acc["ndist"] + 1)
            .alias("ndist"),
        )

    st = F.aggregate(srt, init, step)
    n = F.size(toks)
    return ensure_min_parallelism(docs).select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        st["ndist"].cast("bigint").alias("n_distinct"),
        F.round(st["maxrun"] * F.lit(1.0) / n + F.lit(1e-9), 6).alias("top_token_frac"),
        F.round(F.lit(1.0) - st["ndist"] * F.lit(1.0) / n + F.lit(1e-9), 6).alias(
            "dup_token_frac"
        ),
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 5,
    max_df: int = 50,
) -> DataFrame:
    """Bounded inverted-index build over word n-gram shingles:
    shingle -> (df, tf_total, sorted postings list) — the classic
    MapReduce-era search/retrieval-prep workload re-expressed as
    DataFrame aggregation. Shingles (not unigrams) are the indexed
    term because that is what dedup/decontamination/retrieval
    pipelines actually probe, and unigram postings degenerate to
    corpus-sized lists for every stop word.

    Three-stage shape chosen for 100 TB safety:

    1. ``groupBy(shingle, doc_id)`` -> tf. Keys are near-uniform (a
       shingle repeats within one doc only), map-side combine
       absorbs the per-doc repetition before the exchange.
    2. ``groupBy(shingle)`` -> df/tf_total. Pure count/sum — partial
       aggregation makes boilerplate-shingle skew harmless (no
       postings are materialized here).
    3. Postings lists are collected ONLY for shingles with
       ``min_df <= df <= max_df`` — an explicit skew cap in the
       spirit of ``max_bucket``/``max_df`` elsewhere: a boilerplate
       shingle at web scale has a postings list the size of the
       corpus, and an unconditional ``collect_list`` would OOM the
       executor holding it. Production full-index builds shard
       postings by (term, doc_id range); the capped form is what
       dedup/retrieval pipelines consume (rare-ish content terms).

    One narrow shingle expansion + three bounded shuffles; no
    Python boundary.
    """
    sh = word_shingles(tokens(F.lower(F.col(text_col))), n)
    pairs = (
        ensure_min_parallelism(docs)
        .select(F.col(id_col).alias("doc_id"), F.explode(sh).alias("shingle"))
        .groupBy("shingle", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = pairs.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("tf_total"),
    )
    keep = stats.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    postings = (
        pairs.join(keep.select("shingle"), "shingle")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("postings"))
    )
    return keep.join(postings, "shingle").select("shingle", "df", "tf_total", "postings")


# Gopher rule battery (Rae et al. 2021, "Scaling Language Models",
# table A1 quality heuristics). Thresholds are the published ones
# except the word-count floor, lowered to fit the fixture's 30-80
# token documents while keeping both branches of every flag live.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _gopher_exprs(
    text_col: str, min_words: int, max_words: int, include_keep: bool = True
) -> list:
    """The Gopher battery's aliased output columns (shared by
    :func:`gopher_features` and :func:`curation_quality_gate` so the
    composed gate is the same single-pass projection).
    ``include_keep=False`` omits the battery-local conjunctive
    ``keep`` for callers that combine the flags with further rules —
    an explicit flag, not a positional slice, so reordering or
    extending the battery can never silently shift columns into a
    composed gate."""
    toks = tokens(F.lower(F.col(text_col)))
    n_tok = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mean_len = sum_len.cast("double") / n_tok
    n_symbol = F.length(F.regexp_replace(F.col(text_col), r"[^#]", "")) + F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"\.\.\."), F.lit(0))
    )
    symbol_ratio = n_symbol.cast("double") / n_tok
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_frac = n_alpha.cast("double") / n_tok
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    ok_words = (n_tok >= min_words) & (n_tok <= max_words)
    ok_mean_len = (mean_len >= 3.0) & (mean_len <= 10.0)
    ok_symbol = symbol_ratio <= 0.1
    ok_alpha = alpha_frac >= 0.80
    ok_stop = stop_hits >= 2
    exprs = [
        n_tok.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.cast("bigint").alias("stop_hits"),
        ok_words.alias("ok_words"),
        ok_mean_len.alias("ok_mean_len"),
        ok_symbol.alias("ok_symbol"),
        ok_alpha.alias("ok_alpha"),
        ok_stop.alias("ok_stop"),
    ]
    if include_keep:
        exprs.append(
            (ok_words & ok_mean_len & ok_symbol & ok_alpha & ok_stop).alias("keep")
        )
    return exprs


def gopher_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 35,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher quality-rule battery: per-document features + per-rule
    boolean flags + the conjunctive keep decision.

    Signals (all JVM-side, zero-shuffle narrow projection — at 100 TB
    this is a pure codegen map over the corpus scan):

    - word count in [min_words, max_words]
    - mean word length in [3, 10]
    - symbol-to-word ratio (# and ellipsis) <= 0.1
    - fraction of words containing an alphabetic char >= 0.80
    - >= 2 distinct required stopwords present (the "harmful noise"
      screen from the paper)

    Ratios of exact integers are emitted raw (numeric policy #1: both
    engines divide the same ints to the same double).
    """
    return ensure_min_parallelism(docs).select(
        F.col(id_col), *_gopher_exprs(text_col, min_words, max_words)
    )


def dup_line_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 8,
) -> DataFrame:
    """Gopher repetition signals at line granularity: fraction of
    duplicated lines and fraction of characters inside duplicated
    lines (counting every copy, per the paper).

    The fixture corpus has no newlines, so "lines" are synthesized
    deterministically as consecutive ``line_tokens``-token windows —
    the same expression on both engines (precedent:
    ``text_pii_redact``'s synthesized PII). Real corpora would split
    on newline at the same call site.

    ZERO shuffles: the per-doc line array is sorted and folded in one
    ``aggregate`` run-length scan (the ``repetition_features``
    pattern) — a duplicated line's chars enter the accumulator at
    run-length 2 with double weight (first copy retroactively
    counted), then once per further copy.
    """
    return ensure_min_parallelism(docs).select(
        F.col(id_col), *_dup_line_exprs(text_col, line_tokens)
    )


def _dup_line_exprs(text_col: str, line_tokens: int) -> list:
    """:func:`dup_line_features`'s aliased output columns (shared
    with :func:`curation_quality_gate`)."""
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    n_lines = F.floor((n + line_tokens - 1) / line_tokens).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(toks, i * line_tokens + 1, line_tokens), " "),
    )
    srt = F.array_sort(lines)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("dup_lines"),
        F.lit(0).alias("dup_chars"),
    )

    def step(acc, x):
        is_rep = x.eqNullSafe(acc["prev"])
        run = F.when(is_rep, acc["run"] + 1).otherwise(F.lit(1))
        add_lines = F.when(is_rep & (acc["run"] == 1), 2).when(is_rep, 1).otherwise(0)
        add_chars = add_lines * F.length(x)
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            (acc["dup_lines"] + add_lines).alias("dup_lines"),
            (acc["dup_chars"] + add_chars).alias("dup_chars"),
        )

    st = F.aggregate(srt, init, step)
    total_chars = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    return [
        n_lines.cast("bigint").alias("n_lines"),
        st["dup_lines"].cast("bigint").alias("dup_lines"),
        (st["dup_lines"].cast("double") / n_lines).alias("dup_line_frac"),
        F.try_divide(st["dup_chars"].cast("double"), total_chars).alias(
            "dup_line_char_frac"
        ),
    ]


def top_ngram_char_frac(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Gopher repetition signal: fraction of characters contained in
    the document's most frequent word n-gram (count × n-gram length /
    total chars).

    ZERO shuffles — sorted-shingle run-length scan per row; the
    argmax shingle is tracked alongside the max run with ties broken
    toward the lexicographically smallest shingle (strict ``>`` on a
    sorted array), which the SQL oracle reproduces with
    ``ORDER BY tf DESC, shingle``.
    """
    return ensure_min_parallelism(docs).select(
        F.col(id_col), *_top_ngram_exprs(text_col, n)
    )


def _top_ngram_exprs(text_col: str, n: int) -> list:
    """:func:`top_ngram_char_frac`'s aliased output columns (shared
    with :func:`curation_quality_gate`)."""
    toks = tokens(F.lower(F.col(text_col)))
    sh = word_shingles(toks, n)
    srt = F.array_sort(sh)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("maxrun"),
        F.lit(None).cast("string").alias("argmax"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["maxrun"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["maxrun"]).alias("maxrun"),
            F.when(better, x).otherwise(acc["argmax"]).alias("argmax"),
        )

    st = F.aggregate(srt, init, step)
    n_chars = F.length(F.trim(F.lower(F.col(text_col))))
    frac = F.when(
        st["maxrun"] > 0,
        st["maxrun"] * F.length(st["argmax"]) / n_chars.cast("double"),
    ).otherwise(F.lit(0.0))
    return [
        st["argmax"].alias("top_ngram"),
        st["maxrun"].cast("bigint").alias("top_tf"),
        frac.alias("top_ngram_char_frac"),
    ]


def canonicalize_url(url):
    """URL canonicalization as a pure column expression: lowercase
    scheme+host, strip ``www.``, drop the fragment, drop tracking
    query params (``utm_*``/``ref``; the whole query string if
    nothing else remains), strip one trailing slash. Regexp-only so
    the DuckDB oracle states the identical transform."""
    u = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host (authority = everything before first /?
    head = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1))
    rest = F.regexp_replace(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*", "")
    u = F.concat(head, rest)
    u = F.regexp_replace(u, r"://www\.", "://")
    # drop utm_*/ref params wherever they sit in the query string
    u = F.regexp_replace(u, r"([?&])(utm_[A-Za-z0-9_]*|ref)=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical-URL dedup: canonicalize, group, keep the minimum
    doc_id per canonical URL (the CommonCrawl-style URL-level screen
    that runs before any content hashing).

    One shuffle on the canonical URL (near-uniform key); domain comes
    out of the canonical form with a regexp.
    """
    canon = canonicalize_url(F.col(url_col))
    return (
        ensure_min_parallelism(docs)
        .select(F.col(id_col), canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .withColumn(
            "domain",
            F.regexp_extract(F.col("canonical_url"), r"^[a-z0-9+.-]+://([^/?#]*)", 1),
        )
    )


def c4_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """C4 cleanup-rule battery (Raffel et al. 2020 §2.2): per-doc
    sentence count (segments between terminal punctuation),
    terminal-punctuation ending, and the lorem-ipsum / curly-brace /
    javascript blocklist flags, with the conjunctive keep decision.
    Zero-shuffle narrow projection — pure codegen over the corpus
    scan at any scale."""
    t = F.col(text_col)
    sentences = F.filter(
        F.split(t, r"[.!?]+"), lambda s: F.trim(s) != ""
    )
    n_sent = F.size(sentences)
    has_lorem = t.contains("lorem ipsum")
    has_brace = t.contains("{")
    has_js = F.lower(t).contains("javascript")
    ends_terminal = F.trim(t).rlike(r"[.!?]$")
    return ensure_min_parallelism(docs).select(
        F.col(id_col),
        n_sent.cast("bigint").alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        has_js.alias("has_js"),
        ends_terminal.alias("ends_terminal"),
        (
            (n_sent >= 3) & ~has_lorem & ~has_brace & ~has_js & ends_terminal
        ).alias("keep"),
    )


def curation_quality_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 35,
    max_words: int = 100_000,
    line_tokens: int = 8,
    ngram_n: int = 2,
    max_dup_line_frac: float = 0.30,
    max_top_ngram_char_frac: float = 0.20,
) -> DataFrame:
    """The composed production quality gate: the full Gopher rule
    battery PLUS the paper's repetition thresholds (duplicate-line
    fraction <= 0.30, top-bigram character fraction <= 0.20) in ONE
    zero-shuffle projection — every signal is a pure function of the
    text column, so the whole published filter stack costs a single
    codegen pass over the corpus scan at any scale (no joins between
    per-battery outputs, which is what naively composing the three
    operators would cost).

    Emits per-rule flags, the conjunctive ``keep``, and
    ``drop_reason`` — the FIRST failing rule in a fixed audit order
    (word_count, mean_word_len, symbol_ratio, alpha_frac, stopwords,
    dup_lines, top_ngram) — the column a curation dashboard actually
    aggregates on.
    """
    feats = ensure_min_parallelism(docs).select(
        F.col(id_col),
        *_gopher_exprs(text_col, min_words, max_words, include_keep=False),
        *_dup_line_exprs(text_col, line_tokens),
        *_top_ngram_exprs(text_col, ngram_n),
    )
    ok_dup = F.col("dup_line_frac") <= max_dup_line_frac
    ok_top = F.col("top_ngram_char_frac") <= max_top_ngram_char_frac
    rules = [
        ("word_count", F.col("ok_words")),
        ("mean_word_len", F.col("ok_mean_len")),
        ("symbol_ratio", F.col("ok_symbol")),
        ("alpha_frac", F.col("ok_alpha")),
        ("stopwords", F.col("ok_stop")),
        ("dup_lines", ok_dup),
        ("top_ngram", ok_top),
    ]
    reason = F.lit(None).cast("string")
    for name, ok in reversed(rules):
        reason = F.when(~ok, F.lit(name)).otherwise(reason)
    keep = None
    for _name, ok in rules:
        keep = ok if keep is None else (keep & ok)
    return feats.select(
        F.col(id_col),
        "n_words",
        "dup_line_frac",
        "top_ngram_char_frac",
        ok_dup.alias("ok_dup_lines"),
        ok_top.alias("ok_top_ngram"),
        *[F.col(c) for c in ("ok_words", "ok_mean_len", "ok_symbol", "ok_alpha", "ok_stop")],
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )


def dsir_log_weights(
    docs: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed-n-gram distribution is.

    Two bag-of-tokens models share ONE feature space of ``buckets``
    md5-hashed slots: p = the target subset (rows where ``target`` is
    true), q = the whole raw corpus. A document's log importance
    weight is ``sum_tokens ln p(b(tok)) - ln q(b(tok))`` with
    add-``alpha`` smoothing.

    Scale shape: the model state is exactly ``buckets`` rows no matter
    the corpus size — the bucket-stats aggregation map-side-combines
    down to <= ``buckets`` rows per partition, the log-ratio dim then
    BROADCASTS back onto the token stream, and the only full shuffle
    is the final per-doc sum. Refreshing p against a new target set
    never touches the raw corpus pass.
    """
    ratio = dsir_bucket_model(
        docs, target, id_col=id_col, text_col=text_col, buckets=buckets, alpha=alpha
    )
    # Fit and score share the corpus, so every batch bucket exists in
    # the model — the strict join is value-identical and plans tighter.
    return dsir_score(
        docs, ratio, id_col=id_col, text_col=text_col, buckets=buckets,
        smooth_unseen=False,
    )


def _dsir_buckets(
    docs: DataFrame, extra, id_col: str, text_col: str, buckets: int
) -> DataFrame:
    """(id, *extra, bucket) — one row per token, tokens md5-hashed
    into ``buckets`` slots. Narrow explode, no shuffle."""
    toks = ensure_min_parallelism(docs).select(
        F.col(id_col),
        *extra,
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    return toks.select(
        *[c for c in toks.columns if c != "tok"],
        F.pmod(md5_hash32(F.col("tok")), F.lit(buckets)).alias("b"),
    )


def dsir_bucket_model(
    docs: DataFrame,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the DSIR model: the per-bucket log ratio
    ``ln p_target(b) - ln q_raw(b)`` with add-``alpha`` smoothing —
    at most ``buckets`` rows (observed buckets only; ``dsir_score``
    reconstructs the smoothed value for unseen buckets from the
    totals each row carries). This frame IS the
    reusable state: persist it once and score incrementally arriving
    batches against it (``dsir_score``) without touching the fitted
    corpus again.

    Besides the per-bucket ``lr``, every row carries the corpus totals
    ``raw_tot`` / ``tgt_tot`` so a STORED model is self-describing:
    :func:`dsir_score` uses them to give buckets the model never saw
    their add-``alpha`` smoothed contribution instead of silently
    dropping the token."""
    bucketed = _dsir_buckets(
        docs, [target.alias("is_target")], id_col, text_col, buckets
    )
    stats = bucketed.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tgt_n"),
    )
    # Totals via an unpartitioned window over the <=buckets-row stats
    # frame (single-partition exchange of ~1 KB) — NOT a separate
    # aggregate, which would re-derive stats and re-scan the corpus a
    # third time (Catalyst does not dedupe common subtrees).
    w_all = Window.partitionBy()
    denom = F.lit(float(alpha * buckets))
    return stats.select(
        "b",
        (
            F.log(
                (F.col("tgt_n") + F.lit(float(alpha)))
                / (F.sum("tgt_n").over(w_all) + denom)
            )
            - F.log(
                (F.col("raw_n") + F.lit(float(alpha)))
                / (F.sum("raw_n").over(w_all) + denom)
            )
        ).alias("lr"),
        F.sum("raw_n").over(w_all).alias("raw_tot"),
        F.sum("tgt_n").over(w_all).alias("tgt_tot"),
    )


def dsir_score(
    batch: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
    smooth_unseen: bool = True,
) -> DataFrame:
    """Score a document batch against a (possibly STORED) DSIR bucket
    model: broadcast the ``buckets``-row log-ratio dim onto the
    batch's token stream, one per-doc sum. A model fitted once serves
    every future batch — incremental curation never re-reads the
    fitted corpus.

    Buckets the fitted corpus never produced still contribute their
    add-``alpha`` smoothed log ratio
    ``ln(alpha/(tgt_tot+alpha*B)) - ln(alpha/(raw_tot+alpha*B))``
    (left join + coalesce against the totals the model carries) — an
    inner join would silently drop unseen tokens AND undercount
    ``n_tokens`` on incrementally arriving batches. Callers that fit
    and score the SAME corpus (``dsir_log_weights``) pass
    ``smooth_unseen=False``: every batch bucket provably exists, so
    the cheaper strict inner join (no 1-row defaults normalizer in
    the plan) is value-identical. Models stored before totals existed
    (no ``raw_tot`` column) also fall back to the strict inner join;
    ``alpha``/``buckets`` must match the fit."""
    bucketed = _dsir_buckets(batch, [], id_col, text_col, buckets)
    if not smooth_unseen or "raw_tot" not in model.columns:
        return (
            bucketed.join(F.broadcast(model), "b")
            .groupBy(id_col)
            .agg(F.sum("lr").alias("log_w"), F.count(F.lit(1)).alias("n_tokens"))
        )
    denom = F.lit(float(alpha * buckets))
    a = F.lit(float(alpha))
    # 1-row defaults frame off the <=buckets-row model (max() of a
    # constant-per-row column) — broadcast, so the smoothed default lr
    # reaches every unmatched token row without a corpus pass.
    # coalesce(max, 0): a degenerate EMPTY stored model (0 rows) has
    # NULL totals; its closed-form smoothed lr at raw_tot=tgt_tot=0 is
    # ln(a/denom)-ln(a/denom)=0, which the coalesce reproduces instead
    # of silently NULLing every log_w.
    defaults = model.agg(
        (
            F.log(a / (F.coalesce(F.max("tgt_tot"), F.lit(0)) + denom))
            - F.log(a / (F.coalesce(F.max("raw_tot"), F.lit(0)) + denom))
        ).alias("default_lr")
    )
    return (
        bucketed.join(F.broadcast(model.select("b", "lr")), "b", "left")
        .crossJoin(F.broadcast(defaults))
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce(F.col("lr"), F.col("default_lr"))).alias("log_w"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    target,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """The DSIR selection step: Gumbel-top-k resampling over the
    importance weights — sampling k docs WITHOUT replacement with
    probability proportional to their (soft-maxed) importance.

    The Gumbel noise is derived, not drawn: ``g = -ln(-ln(u))`` with
    ``u = (md5_32('g_' || id) + 0.5) / 2^32`` — every step IEEE
    correctly-rounded, so the selected set is bit-identical across
    engines, retries, and partitionings (no RNG state to checkpoint).
    Plans as TakeOrderedAndProject: per-partition top-k then a k-row
    reduce, never a global sort.
    """
    w = dsir_log_weights(
        docs, target, id_col=id_col, text_col=text_col, buckets=buckets, alpha=alpha
    )
    u = (md5_hash32(F.concat(F.lit("g_"), F.col(id_col).cast("string"))) + F.lit(0.5)) / F.lit(
        float(2**32)
    )
    scored = w.withColumn("score", F.col("log_w") - F.log(-F.log(u)))
    # Order by the 6-decimal-ROUNDED score (the repo's r6-before-
    # ordering convention): log_w is a shuffle-order-dependent float
    # sum, so two docs straddling the k boundary whose scores round
    # equal must tie-break on doc_id in the SAME domain the oracle
    # orders in — raw-float ordering can flip across engines/retries.
    return scored.orderBy(
        F.round(F.col("score") + F.lit(1e-9), 6).desc(), F.col(id_col)
    ).limit(k)


def unimax_sample(
    docs: DataFrame,
    budget_frac: float = 0.4,
    max_epochs: float = 2.0,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): allocate a total
    token budget across languages so every language is repeated at
    most ``max_epochs`` times, with the budget freed by small
    languages redistributed UNIFORMLY over the rest — the fairness fix
    for temperature sampling's low-resource over-repetition.

    The published algorithm is a sequential loop over languages
    (ascending by size); that loop IS water-filling, so it folds into
    a closed form over one window pass: with caps ``c_l = E * L_l``
    sorted ascending, language ``l`` is budget-capped iff
    ``c_l < (B - cumsum_before(c)) / n_remaining``, capped languages
    take their cap, and every uncapped language takes the shared
    water level ``(B - sum(capped caps)) / n_uncapped``.

    Scale shape: model state is one row per LANGUAGE — the token
    totals map-side-combine, the whole allocation runs as windows
    over that languages-sized frame, and the per-language epoch rate
    broadcasts back. The keep decision is an md5-threshold pure
    function of the doc id (no RNG state): reproducible across
    engines, retries, and cluster sizes.
    """
    d = ensure_min_parallelism(docs).select(
        F.col(id_col),
        F.col(lang_col),
        F.size(tokens(F.lower(F.col(text_col)))).alias("n_tok"),
    )
    stats = d.groupBy(lang_col).agg(F.sum("n_tok").alias("lang_toks"))
    w_ord = Window.orderBy("cap", lang_col)
    w_all = Window.partitionBy()
    s = (
        stats.withColumn(
            "cap", F.col("lang_toks").cast("double") * F.lit(float(max_epochs))
        )
        .withColumn(
            "budget",
            F.sum("lang_toks").over(w_all).cast("double") * F.lit(float(budget_frac)),
        )
        .withColumn(
            "cum_before",
            F.coalesce(
                F.sum("cap").over(w_ord.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0.0),
            ),
        )
        .withColumn("idx", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "tau_i",
            (F.col("budget") - F.col("cum_before"))
            / (F.col("n") - F.col("idx") + 1).cast("double"),
        )
        .withColumn("is_capped", F.col("cap") < F.col("tau_i"))
        .withColumn("n_capped", F.sum(F.col("is_capped").cast("int")).over(w_all))
        .withColumn(
            "capped_sum",
            F.coalesce(
                F.sum(F.when(F.col("is_capped"), F.col("cap"))).over(w_all), F.lit(0.0)
            ),
        )
    )
    # capped rows take their cap; the rest share the final water level.
    # (is_capped implies n_capped >= 1 only for OTHER rows' division --
    # the divisor n - n_capped is evaluated only on uncapped rows,
    # where it is >= 1 by definition.)
    alloc = F.when(F.col("is_capped"), F.col("cap")).otherwise(
        (F.col("budget") - F.col("capped_sum"))
        / (F.col("n") - F.col("n_capped")).cast("double")
    )
    rates = s.select(
        lang_col,
        "lang_toks",
        (alloc / F.col("lang_toks").cast("double")).alias("epochs"),
    )
    u = (
        md5_hash32(F.concat(F.lit("u_"), F.col(id_col).cast("string"))) + F.lit(0.5)
    ) / F.lit(float(2**32))
    return (
        d.join(F.broadcast(rates), lang_col)
        .select(
            id_col,
            lang_col,
            "n_tok",
            F.col("epochs"),
            (u < F.least(F.col("epochs"), F.lit(1.0))).alias("kept"),
        )
    )


def line_dedup_global(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    line_tokens: int = 8,
    max_df: int = 1,
) -> DataFrame:
    """Corpus-LEVEL line deduplication (the RefinedWeb / CCNet
    boilerplate-removal step): a line survives only if it appears in
    at most ``max_df`` distinct documents; each document is then
    reassembled from its surviving lines in original order. This is
    the cross-document complement of ``dup_line_features`` (which
    scores repetition WITHIN a doc) — nav bars, cookie banners, and
    license footers repeat across docs and vanish here.

    "Lines" are the same deterministic ``line_tokens``-token windows
    as ``dup_line_features`` (the fixture corpus has no newlines;
    real corpora split on newline at this call site).

    Shape: one groupBy on the md5 line key for the document-frequency
    dim (map-side combined; boilerplate hot lines are just counters,
    never materialized lists), one join back (AQE broadcasts the df
    dim when it measures small), one per-doc reassembly groupBy.
    Reassembly order rides a struct sort inside the aggregated array —
    no window, no secondary shuffle.
    """
    w = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(w) / F.lit(float(line_tokens))).cast("int")
    lines = ensure_min_parallelism(docs).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(w, i * line_tokens + 1, line_tokens), " "
                ),
            )
        ).alias("i", "line"),
    )
    keyed = lines.withColumn("lk", F.md5(F.col("line")))
    df_dim = (
        keyed.groupBy("lk")
        .agg(F.count_distinct(F.col(id_col)).alias("line_df"))
        .where(F.col("line_df") <= max_df)
        .select("lk")
    )
    kept = keyed.join(df_dim, "lk").drop("lk")
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "line"))),
                lambda s: s["line"],
            ),
            " ",
        ).alias("clean"),
    )
    # Per-doc line total = the chunk count, a pure function of the
    # token count — previously a SECOND full pass over the exploded
    # lines (the tokenize+window subplan re-ran end to end, plus a
    # corpus-keyed groupBy exchange of every line row) just to count
    # what the narrow projection already knows (r11, guide §1.2:
    # don't compute things you throw away). posexplode emits exactly
    # n_chunks rows per doc (sequence(0, n_chunks-1) — ≥ 1, since
    # tokens() yields [""] for empty text), so the values are
    # identical by construction; the null-text guard reproduces the
    # old inner-groupBy semantics (no lines → doc absent).
    totals = docs.select(
        F.col(id_col), n_chunks.cast("bigint").alias("n_lines")
    ).where(F.col("n_lines").isNotNull())
    # merge hint: with totals now narrow (good size stats), the
    # planner would otherwise BROADCAST the right side — reassembled
    # carries the full cleaned TEXT per doc, a corpus-cardinality
    # string column that must never ship as a build relation at any
    # scale (measured 2.8 s broadcast vs 1.8 s merge at the 10×
    # lake); sort-merge reuses reassembled's groupBy partitioning,
    # so the hint costs one tiny (id, n_lines) exchange.
    return (
        totals.join(reassembled.hint("merge"), id_col, "left")
        .select(
            id_col,
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("clean"), F.lit("")).alias("clean"),
        )
    )
