"""Deduplication operators for the training-data-pipeline layer.

Not in the reference (raster pipeline); added as first-class engine
components for LLM-scale curation. All hashing is md5-derived so the
DuckDB oracle reproduces results bit-exactly; at 100 TB the same
shapes run unchanged (hash-groupBy and band-bucket self-joins are
single-shuffle, and candidate verification touches only bucket-local
pairs — never the O(n²) cross join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.partitioning import ensure_min_parallelism
from weather4cast_bigdata_spark.functions.text import (
    md5_hash32,
    md5_hash64,
    tokens,
    word_shingles,
)

# Fixed affine permutations for minhash: h_i(x) = (a_i·x + b_i) mod P.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1 (Mersenne)
MINHASH_PERMS: list[tuple[int, int]] = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
]


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: md5-groupBy keeping the minimum id as canonical.

    Returns (text_hash, canonical_id, n_copies). Single shuffle on the
    128-bit hash — uniform keys, no skew at any scale.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def doc_shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle).

    Dedup happens per-row via ``array_distinct`` BEFORE the explode —
    no distinct() shuffle; the plan stays narrow until a downstream
    operator asks for one.
    """
    sh = F.array_distinct(word_shingles(tokens(F.col(text_col)), n))
    return ensure_min_parallelism(docs).select(F.col(id_col), F.explode(sh).alias("shingle"))


def doc_shingle_hashes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct 32-bit shingle hashes per doc: (id, h32).

    Hashing happens map-side, pre-shuffle, so every downstream
    exchange (minhash groupBy, Jaccard pair join) moves 8-byte ints
    instead of shingle strings — at 100 TB that is the difference
    between shuffling ~3× the corpus and shuffling a few percent of
    it.
    """
    sh = word_shingles(tokens(F.col(text_col)), n)
    hashes = F.array_distinct(F.transform(sh, md5_hash32))
    return ensure_min_parallelism(docs).select(F.col(id_col), F.explode(hashes).alias("h32"))


def minhash_signatures_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    n_hashes: int = 4,
) -> DataFrame:
    """MinHash signatures with NO shuffle at all: per-row
    ``array_min`` over the affine-permuted shingle hashes. Duplicate
    shingles cannot change a min, so no dedup pass is needed either —
    the whole operator is a narrow projection that scales linearly
    with the corpus. Docs with fewer than ``n`` tokens (empty shingle
    set) are excluded, matching the grouped form's semantics.
    """
    sh = word_shingles(tokens(F.col(text_col)), n)
    d = ensure_min_parallelism(docs).select(
        F.col(id_col), F.transform(sh, md5_hash32).alias("_hs")
    ).where(F.size("_hs") > 0)
    cols = [
        F.array_min(
            F.transform("_hs", lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(MINHASH_PERMS[:n_hashes])
    ]
    return d.select(F.col(id_col), *cols)


#: Default document-frequency stop-list cap for shingle-bucket pair
#: enumeration.  A shingle appearing in d docs yields d(d-1)/2 pair
#: rows, so an uncapped boilerplate n-gram ("all rights reserved")
#: shared by 1e6 web docs would emit 5e11 rows from ONE bucket.  256
#: bounds the worst bucket at ~32k pair rows while being far above
#: any genuine near-dup cluster's shingle df.  Recall-only: the
#: Jaccard denominator keeps the full per-doc set size, so capping
#: can lower a pair's score but never fabricate one.  Mirrored as the
#: `live` CTE (HAVING count(*) <= 256) in every pair-enumerating
#: oracle in plans/registry.py — keep the two in sync.
NGRAM_MAX_DF = 256


def ngram_jaccard_pairs_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = NGRAM_MAX_DF,
) -> DataFrame:
    """Single-pass hashed-shingle Jaccard from the doc table: the
    per-doc set size rides the explode, so there is no separate size
    branch and no post-aggregation size lookups.

    Pair formation is ONE shuffle (groupBy the 8-byte shingle hash)
    with ordered-pair enumeration done JVM-side by higher-order
    functions — ~1.5× faster than the equivalent self-join, which
    shuffles both sides and recomputes the shingle map twice. Same
    skew profile as the join form (all pairs of one shingle land in
    one task either way); ``max_df`` (default :data:`NGRAM_MAX_DF`)
    stop-lists high-document-frequency shingles (boilerplate n-grams
    shared by thousands of docs, SCALING.md §3): a shingle in d docs
    yields d(d−1)/2 pair rows, so the cap bounds the worst bucket's
    blowup quadratically. The denominator keeps the full per-doc set
    size, so stop-listing can only lower a pair's Jaccard — a recall
    knob, never a false-positive source. Pass ``max_df=None`` only
    for bounded corpora where exact all-pairs recall is required.
    """
    inter = _ngram_intersections(docs, id_col, text_col, n, max_df)
    return (
        inter.withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


def _ngram_intersections(
    docs: DataFrame, id_col: str, text_col: str, n: int, max_df: int | None
) -> DataFrame:
    """Shared shingle-bucket intersection counter: one shuffle on the
    8-byte shingle hash, ordered-pair enumeration JVM-side, returns
    (id_a, id_b, sz_a, sz_b, inter) for every co-bucketed pair —
    the input of both the symmetric Jaccard and the asymmetric
    containment scorers."""
    sh = word_shingles(tokens(F.col(text_col)), n)
    base = ensure_min_parallelism(docs).select(
        F.col(id_col), F.array_distinct(F.transform(sh, md5_hash32)).alias("_hs")
    )
    sing = base.select(
        F.col(id_col), F.size("_hs").alias("sz"), F.explode("_hs").alias("h32")
    )
    grouped = sing.groupBy("h32").agg(
        F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("sz")))).alias("ms")
    )
    if max_df is not None:
        grouped = grouped.where(F.size("ms") <= max_df)
    pairs = grouped.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ms",
                    lambda x, i: F.transform(
                        F.slice("ms", i + F.lit(2), F.size("ms")),
                        lambda y: F.struct(
                            x[id_col].alias("id_a"),
                            x["sz"].alias("sz_a"),
                            y[id_col].alias("id_b"),
                            y["sz"].alias("sz_b"),
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.*")
    return pairs.groupBy("id_a", "id_b", "sz_a", "sz_b").agg(
        F.count(F.lit(1)).alias("inter")
    )


def ngram_containment_pairs_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = NGRAM_MAX_DF,
) -> DataFrame:
    """Asymmetric near-dup: shingle CONTAINMENT
    ``C(contained → container) = |A ∩ B| / |A|`` — catches what
    Jaccard structurally cannot: a short doc quoted or wholly embedded
    inside a much longer one has J ≈ |A|/|B| (diluted to ~0 by the
    container's size) but C = 1. This is the truncated-copy /
    quote-extraction / boilerplate-superset detector every crawl
    pipeline runs next to its symmetric dedup.

    Shape: identical to the Jaccard form — the SAME single shuffle on
    the 8-byte shingle hash and the same ``max_df`` stop-list; the
    intersection counts are just normalized per DIRECTION afterwards
    (a union of two projections, no extra exchange of the corpus).
    Emits (contained_id, container_id, containment ≥ threshold);
    both directions of a pair can appear (mutual near-copies).
    """
    inter = _ngram_intersections(docs, id_col, text_col, n, max_df)
    # one explode, not a self-union: a union would reference the
    # intersection subtree twice and re-run its shuffle
    both = inter.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("contained_id"),
                    F.col("id_b").alias("container_id"),
                    (F.col("inter") / F.col("sz_a")).alias("containment"),
                ),
                F.struct(
                    F.col("id_b").alias("contained_id"),
                    F.col("id_a").alias("container_id"),
                    (F.col("inter") / F.col("sz_b")).alias("containment"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    return both.where(F.col("containment") >= F.lit(threshold))


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", n_hashes: int = 4, hash_col: str | None = None
) -> DataFrame:
    """MinHash signature per doc: for each permutation i, the min over
    shingles of ``(aᵢ·h32(shingle) + bᵢ) mod P``.

    One groupBy(id) with n_hashes min-aggregates — map-side combine
    keeps shuffle volume at n_hashes·8 bytes per doc regardless of
    document length. Accepts either (id, shingle) strings or the
    pre-hashed (id, h32) form from ``doc_shingle_hashes`` (duplicate
    hashes cannot change a min, so both yield identical signatures).
    """
    if hash_col is None:
        hash_col = "h32" if "h32" in shingled.columns else None
    h = F.col(hash_col) if hash_col else md5_hash32(F.col("shingle"))
    aggs = []
    for i, (a, b) in enumerate(MINHASH_PERMS[:n_hashes]):
        aggs.append(
            F.min((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{i}")
        )
    return shingled.groupBy(id_col).agg(*aggs)


def banded_signatures(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 4,
    band_size: int = 2,
) -> DataFrame:
    """MinHash signatures → the banded LSH key table
    ``(id, band_idx, band_key)`` — the unit that gets self-joined for
    in-corpus dedup (``lsh_candidate_pairs``) or PERSISTED as an
    incremental near-dup index (``sink_lsh_index``: new batches probe
    stored bands instead of recomputing the corpus)."""
    if n_hashes % band_size != 0:
        raise ValueError(
            f"n_hashes={n_hashes} not divisible by band_size={band_size}: "
            "trailing signature columns would be silently un-banded, "
            "lowering recall below the configured level"
        )
    n_bands = n_hashes // band_size
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"mh_{i}").cast("string")
                        for i in range(b * band_size, (b + 1) * band_size)
                    ],
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    # One explode instead of an n_bands-way union: the union form
    # recomputes the signature subplan once per band.
    return signatures.select(
        F.col(id_col), F.explode(band_structs).alias("_b")
    ).select(
        F.col(id_col),
        F.col("_b.band_idx").alias("band_idx"),
        F.col("_b.band_key").alias("band_key"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 4,
    band_size: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any full band of the signature become
    a candidate pair (id_a < id_b, deduplicated).

    Band self-join is bucket-local: shuffle on (band_idx, band_hash)
    then pairs form only inside buckets — linear in bucket sizes.
    ``max_bucket`` drops over-populated buckets (boilerplate/template
    documents all sharing one band): a b-doc bucket emits b(b−1)/2
    pairs, so one pathological bucket otherwise dominates the stage —
    the standard recall-for-boundedness trade at web scale
    (SCALING.md §3); capped-out docs still pair through their other
    bands.
    """
    banded = banded_signatures(signatures, id_col, n_hashes, band_size)
    # One shuffle (groupBy bucket) + JVM-side ordered-pair enumeration
    # beats the band self-join (two shuffles + recomputed signatures).
    grouped = banded.groupBy("band_idx", "band_key").agg(
        F.array_sort(F.collect_set(id_col)).alias("ids")
    )
    if max_bucket is not None:
        grouped = grouped.where(F.size("ids") <= max_bucket)
    return (
        grouped.where(F.size("ids") > 1)
        .select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda x, i: F.transform(
                            F.slice("ids", i + F.lit(2), F.size("ids")),
                            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
    )


def ngram_jaccard_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity for doc pairs sharing ≥1 shingle
    (optionally restricted to LSH candidates): |A∩B| / |A∪B| ≥ t.

    Pair formation is shingle-bucket-local (shuffle on the shingle
    key), so cost tracks shared-shingle volume, not n². Prefers the
    pre-hashed (id, h32) form — the pair join then exchanges 8-byte
    ints rather than shingle strings.
    """
    key = "h32" if "h32" in shingled.columns else "shingle"
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    l = shingled.select(F.col(id_col).alias("id_a"), key)
    r = shingled.select(F.col(id_col).alias("id_b"), key)
    inter = (
        l.join(r, on=key)
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["id_a", "id_b"], how="inner")
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "jaccard")
    )


_PREFIX_BASE_CACHE: list = []


def prefix_filtered_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    split_bucket: int = 4096,
    n_salt: int = 32,
) -> DataFrame:
    """EXACT all-pairs Jaccard join via prefix filtering (the
    AllPairs / PPJoin family) — the lossless scale path where
    ``ngram_jaccard_pairs_docs``'s ``max_df`` stop-list is a
    recall-only approximation.

    Principle: fix a global total order on the shingle universe —
    here ascending document frequency, rarest first, ties by hash —
    and sort every document's shingle set in that order.  For
    Jaccard ≥ t a pair must overlap in ≥ ceil(t·|x|) elements of
    either side, so by pigeonhole the first
    ``p(x) = |x| − ceil(t·|x|) + 1`` elements of x (its *prefix*)
    must contain at least one common element with y's prefix.  Only
    prefix tokens are exploded into buckets; candidate pairs then
    verify the true Jaccard on the full hash sets and filter ≥ t —
    no recall loss, bit-identical to the brute-force join.

    Role split (PPJoin's indexing prefix, Xiao et al. WWW'08 §3.2):
    pairs are oriented by the global (size, id) order — the smaller
    doc is the INDEXED side and needs only its first
    ``|x| − ceil(2t/(1+t)·|x|) + 1`` tokens in buckets (~1/3 shorter
    at t = 0.5), because overlap ≥ ceil(2t/(1+t)·|x|) whenever
    |y| ≥ |x| and J ≥ t; the larger doc probes with the full
    prefix.  Per-bucket candidate volume drops from pref² to
    pi·pref, and the Jaccard length filter (|y| ≤ |x|/t) is applied
    INSIDE both candidate branches so size-incompatible pairs never
    reach an exchange.  Lossless: every J ≥ t pair shares a token
    inside smaller-index × larger-probe windows by the pigeonhole
    above.

    Why it scales where bucket enumeration doesn't: rare-first
    ordering pushes boilerplate shingles ("all rights reserved",
    df ~ 1e6) to the END of every document, so they enter a prefix
    only for documents that consist of almost nothing else.  Bucket
    population tracks *rare*-shingle df, which Zipf keeps small —
    the d(d−1)/2 blowup of the unfiltered form never materialises,
    and the additional length filter (min_sz ≥ t·max_sz, a Jaccard
    necessary condition) prunes cross-length pairs inside surviving
    buckets.

    Cost: 4 shuffles (df count, df join, per-doc re-sort, prefix
    buckets) + the candidate-verify hash joins — more exchanges than
    the single-shuffle enumerator, but every exchange is linear in
    corpus size while the enumerator's output is quadratic in bucket
    population; at web scale the pair volume dominates everything.
    The ceil() guards subtract 1e-9 before rounding so a float
    representation error can only LENGTHEN a prefix or ADMIT an
    extra candidate (verified away later), never drop a true pair.

    The shingle-hash base is persisted (it feeds the df count, the
    prefix explode, AND both verify sides); because the result is
    returned lazily the cache cannot be released inside this
    function, so each new invocation evicts the previous call's
    cached base — repeated calls hold at most one corpus-sized cache,
    not an accumulating pile.

    Oversized-bucket split (straggler/OOM guard, still LOSSLESS): the
    default enumeration materializes each prefix bucket as ONE
    ``collect_list`` array and explodes its pairs inside one row —
    fine under Zipf, but one adversarial hot prefix token would put
    the whole bucket in a single task. Buckets larger than
    ``split_bucket`` docs therefore switch to a salted two-sided
    equi self-join: side A carries each doc once with salt
    ``md5(id) % n_salt``, side B replicates each doc across all
    ``n_salt`` salt values, and the join key is (token, salt) — every
    pair still meets exactly once (at A's salt), but the bucket's
    b²/2 pair enumeration spreads over ``n_salt`` tasks and no task
    ever holds the bucket as one array. Exactness is untouched: the
    split only changes WHERE candidate pairs are enumerated; both
    routes feed the same full-set Jaccard verification.
    """
    sh = word_shingles(tokens(F.col(text_col)), n)
    base = (
        ensure_min_parallelism(docs)
        .select(
            F.col(id_col),
            F.array_distinct(F.transform(sh, md5_hash32)).alias("_hs"),
        )
        .where(F.size("_hs") > 0)
        .persist()
    )
    while _PREFIX_BASE_CACHE:
        try:
            _PREFIX_BASE_CACHE.pop().unpersist()
        except Exception:
            pass  # stale handle from a stopped session
    _PREFIX_BASE_CACHE.append(base)
    sing = base.select(
        F.col(id_col), F.size("_hs").alias("sz"), F.explode("_hs").alias("h32")
    )
    dfreq = sing.groupBy("h32").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        sing.join(dfreq, "h32")
        .groupBy(id_col, "sz")
        .agg(F.array_sort(F.collect_list(F.struct("df", "h32"))).alias("_ord"))
    )
    plen = (
        F.col("sz")
        - F.ceil(F.col("sz") * F.lit(threshold) - F.lit(1e-9))
        + F.lit(1)
    ).cast("int")
    # PPJoin indexing prefix (Xiao et al. WWW'08 §3.2 / Bayardo
    # AllPairs): when the pair's roles are fixed so the SMALLER doc is
    # the indexed side, overlap >= ceil(2t/(1+t)·|x|) for |y| >= |x|,
    # so only the first |x| - ceil(2t/(1+t)·|x|) + 1 tokens of x need
    # indexing (~1/3 shorter at t=0.5 than the probing prefix) — the
    # r7 "length-banded prefix index" lever: candidate volume per
    # bucket drops from pref² to pi·pref. The 1e-9 guard can only
    # LENGTHEN the index prefix (admit extra candidates), never drop
    # a true pair.
    pilen = (
        F.col("sz")
        - F.ceil(
            F.col("sz") * F.lit(2.0 * threshold / (1.0 + threshold))
            - F.lit(1e-9)
        )
        + F.lit(1)
    ).cast("int")
    # posexplode: each prefix token carries its 0-based position in
    # the doc's df-ordered shingle list — the PPJoin positional
    # filter's input (every common token of a pair sits at or after
    # the pair's EARLIEST common token, so overlap <= min over sides
    # of "elements from that token onward" = min(sz - pos)); `ix`
    # marks the tokens inside the shorter INDEX prefix.
    pref = (
        ordered.select(
            F.col(id_col),
            F.col("sz"),
            F.posexplode(F.slice("_ord", F.lit(1), plen)).alias("pos", "_t"),
            pilen.alias("_pil"),
        )
        # df = 1 tokens occupy a position in the order (pos/pa/pb are
        # assigned BEFORE this filter, so the positional bound is
        # untouched) but their buckets are singletons — they cannot
        # produce a pair, so dropping them here is lossless and
        # removes the (Zipf-dominant) rare-token tail from the
        # census, the bucket groupBy, and both big-bucket join sides.
        .where(F.col("_t")["df"] > 1)
        .select(
            F.col(id_col),
            "sz",
            "pos",
            F.col("_t")["h32"].alias("h32"),
            (F.col("pos") < F.col("_pil")).alias("ix"),
        )
    )
    # Bucket census: a map-side-combinable groupBy count (shuffles
    # depth-1 partial counts, not rows), keeping ONLY the oversized
    # keys, then a left join back — rows that match are big-bucket
    # rows. The previous form (count() OVER (PARTITION BY h32))
    # shuffled AND SORTED every prefix row just to learn its bucket
    # size: measured 22 s of the 26 s prefix stage at sf1 (10×
    # sf0.1), all replaced by this tiny-right-side hash join (Zipf
    # bounds oversized keys to pref_rows/split_bucket, and AQE
    # broadcasts the filtered count frame when it is small).
    # The RAW prefix is persisted BEFORE the census branches off:
    # the census and the left join are two consumers of the same
    # explode plan, and an unpersisted prefix would be recomputed
    # (df join, doc re-sort and all) once per branch. Downstream's
    # three consumers (small-bucket groupBy, big-bucket side A,
    # big-bucket side B) then redo only the cheap hash join against
    # the tiny key frame, never the prefix plan itself.
    pref = pref.persist()
    _PREFIX_BASE_CACHE.append(pref)
    _big_keys = (
        pref.groupBy("h32")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > split_bucket)
    )
    pref = pref.join(_big_keys, "h32", "left")
    # Bucket members sort by (sz, id): the earlier element of any
    # pair is the SMALLER doc (ties by id) — the indexed side of the
    # PPJoin role split. x contributes a candidate only when this
    # token lies in x's index prefix (x.ix), and the Jaccard length
    # filter (|y| <= |x|/t, the only direction left once sz_y >=
    # sz_x) prunes INSIDE the enumeration — incompatible pairs never
    # reach the exchange (previously filtered post-union).
    buckets = (
        pref.where(F.col("_bn").isNull())
        .groupBy("h32")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("sz"), F.col(id_col), F.col("pos"), F.col("ix"))
                )
            ).alias("ms")
        )
        .where(F.size("ms") > 1)
    )
    cand_small = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "ms",
                        lambda x, i: F.transform(
                            F.filter(
                                F.slice("ms", i + F.lit(2), F.size("ms")),
                                lambda y: x["ix"]
                                & (
                                    y["sz"] * F.lit(threshold) - F.lit(1e-9)
                                    <= x["sz"]
                                ),
                            ),
                            lambda y: F.struct(
                                x[id_col].alias("id_a"),
                                x["sz"].alias("sz_a"),
                                x["pos"].alias("pa"),
                                y[id_col].alias("id_b"),
                                y["sz"].alias("sz_b"),
                                y["pos"].alias("pb"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
    )
    big = pref.where(F.col("_bn").isNotNull())
    # index side: only index-prefix tokens of the (to-be) smaller doc
    side_a = big.where(F.col("ix")).select(
        "h32",
        F.col(id_col).alias("id_a"),
        F.col("sz").alias("sz_a"),
        F.col("pos").alias("pa"),
        F.pmod(md5_hash32(F.col(id_col).cast("string")), F.lit(n_salt)).alias("_s"),
    )
    side_b = big.select(
        "h32",
        F.col(id_col).alias("id_b"),
        F.col("sz").alias("sz_b"),
        F.col("pos").alias("pb"),
        F.explode(F.array(*[F.lit(i) for i in range(n_salt)])).alias("_s"),
    )
    cand_big = side_a.join(side_b, ["h32", "_s"]).where(
        (
            (F.col("sz_a") < F.col("sz_b"))
            | ((F.col("sz_a") == F.col("sz_b")) & (F.col("id_a") < F.col("id_b")))
        )
        & (F.col("sz_b") * F.lit(threshold) - F.lit(1e-9) <= F.col("sz_a"))
    )
    # PPJoin positional filter, count-tightened (the Spark-shaped
    # stand-in for PPJoin+'s suffix probe): both sides are sorted by
    # the SAME global order, so a pair's common tokens form one
    # increasing sequence on both sides simultaneously, and the set
    # of window-common tokens — the rows this groupBy receives, now
    # a's INDEX window × b's probe window — is still exactly the
    # FIRST c common tokens (a common token is received iff BOTH its
    # coordinates are inside the windows, and coordinates increase
    # together, so the received set is a prefix of the common
    # sequence), the last of them at (max pa, max pb). Every further
    # common token must sit strictly after both maxima, hence
    #   overlap <= c + min(sz_a - max_pa - 1, sz_b - max_pb - 1).
    # For c = 1 this reduces to the classic earliest-token bound
    # min(sz_a - pa, sz_b - pb); for c >= 2 it is strictly tighter
    # (each extra shared prefix token advances max_pa by at least 1,
    # so the bound cannot grow). Jaccard >= t needs overlap >=
    # t/(1+t)·(sz_a+sz_b); pairs whose bound falls short verify to
    # < t with certainty and are dropped BEFORE the expensive
    # full-set verify join. The groupBy replaces the plain distinct
    # (same single exchange); the 1e-9 slack can only ADMIT an extra
    # candidate, never drop a true pair. (AllPairs -> PPJoin,
    # Xiao et al., WWW'08; the count+last-position form plays the
    # role of §4.2's suffix filter without probing suffix tokens.)
    # (the Jaccard length filter already ran inside both candidate
    # branches — size-incompatible pairs never entered the union)
    cand = (
        cand_small.unionByName(
            cand_big.select("id_a", "sz_a", "pa", "id_b", "sz_b", "pb")
        )
        .groupBy("id_a", "id_b")
        .agg(
            # c = shared window tokens; each (id_a, id_b, token)
            # triple reaches this aggregate exactly once (roles are
            # fixed by the global (sz, id) order, small buckets
            # enumerate each pair once per token, and the salted
            # split meets once per token at side A's salt)
            F.count(F.lit(1)).alias("_c"),
            F.max("pa").alias("_pa"),
            F.max("pb").alias("_pb"),
            # sizes are constant per id, min() is just the cheapest
            # associative carrier
            F.min("sz_a").alias("sz_a"),
            F.min("sz_b").alias("sz_b"),
        )
        .where(
            F.col("_c")
            + F.least(
                F.col("sz_a") - F.col("_pa") - F.lit(1),
                F.col("sz_b") - F.col("_pb") - F.lit(1),
            )
            >= (F.col("sz_a") + F.col("sz_b"))
            * F.lit(threshold / (1.0 + threshold))
            - F.lit(1e-9)
        )
        .select("id_a", "id_b")
    )
    a = base.select(F.col(id_col).alias("id_a"), F.col("_hs").alias("_hs_a"))
    b = base.select(F.col(id_col).alias("id_b"), F.col("_hs").alias("_hs_b"))
    inter = F.size(F.array_intersect("_hs_a", "_hs_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("_hs_a") + F.size("_hs_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
        # internal roles are size-ordered (id_a = smaller doc);
        # restore the id-ordered output contract
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            "jaccard",
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Duplicate-cluster canonicalization: connected components over a
    near-dup pair graph via iterative min-label propagation. Returns
    ``(id, comp)`` where ``comp`` is the minimum id reachable in the
    node's component — the canonical document of that cluster.

    Labels seed at the closed-neighborhood minimum ``min(id,
    min(neighbor))`` — one groupBy that absorbs the first propagation
    round. Each subsequent round is a neighbor-label groupBy-min over
    the symmetrized edge list followed by one pointer-jumping step
    (``comp ← min(comp, comp[comp])``, a self-join on the label
    table), so the distance to the component minimum roughly halves
    per round: convergence is O(log diameter), not O(diameter) — a
    1000-node chain needs ~10 rounds, and the dense tiny-diameter
    clusters near-dup graphs actually produce converge at the seed and
    exit on the first no-improvement probe. Labels are
    ``localCheckpoint``-ed per round so lineage stays O(1) instead of
    doubling per iteration.
    """
    # Symmetrize with one explode instead of a self-union: the union
    # form evaluates the (often expensive) edge subplan twice before
    # the persist can help.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("id"), F.col(dst).alias("nbr")),
                    F.struct(F.col(dst).alias("id"), F.col(src).alias("nbr")),
                )
            ).alias("_e")
        )
        .select("_e.id", "_e.nbr")
        .distinct()
        .persist()
    )
    # Seed with the closed-neighborhood minimum, min(id, min(nbr)) —
    # one groupBy that replaces both the distinct-ids seed AND the
    # first neighbor-min round of the loop: the dense small-diameter
    # clusters near-dup graphs actually produce (where some node's id
    # is every node's neighbor minimum) converge at the seed and exit
    # on the first probe.
    labels = (
        sym.groupBy("id")
        .agg(F.min("nbr").alias("_m"))
        .select("id", F.least(F.col("id"), F.col("_m")).alias("comp"))
    ).localCheckpoint(eager=True)
    for _round in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "nbr"), on="nbr")
            .select("id", "comp")
            .union(labels)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # Pointer jump: follow the label one hop (comp's own label is
        # always ≤ comp, since every label table satisfies comp ≤ id —
        # the seed is least(id, ·) and rounds only decrease labels).
        nxt = (
            nbr_min.join(
                nbr_min.select(
                    F.col("id").alias("comp"), F.col("comp").alias("_jump")
                ),
                on="comp",
                how="left",
            )
            .select("id", F.coalesce("_jump", "comp").alias("comp"))
        ).localCheckpoint(eager=True)
        improved = (
            nxt.join(labels.withColumnRenamed("comp", "prev"), on="id")
            .where(F.col("comp") < F.col("prev"))
            .take(1)
        )
        labels = nxt
        if not improved:
            break
    sym.unpersist()
    return labels


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    hash_bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint: per bit b, sign of Σ_tokens (±1 by bit b of
    hash(token)); composed into a ``bits``-wide integer.

    Token explode + single groupBy(id) with ``bits`` conditional sums.
    ``hash_bits`` selects the per-token hash source: 32 (md5_hash32,
    the default — every signature of ≤32 bits, bit-stable with all
    recorded results) or 60 (md5_hash60 — for scale-adaptive widths
    past 32 bits; its LOW bits differ from md5_hash32's, so the two
    sources are distinct signature families, each restated 1:1 in its
    oracle)."""
    assert bits <= hash_bits and hash_bits in (32, 60)
    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    from weather4cast_bigdata_spark.functions.text import md5_hash60

    h = (md5_hash32 if hash_bits == 32 else md5_hash60)(F.col("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"bit_{b}")
        for b in range(bits)
    ]
    per_bit = toks.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.col(f"bit_{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(F.lit(0))
    return per_bit.select(F.col(id_col), sig.alias("simhash"))


def substring_dup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """Exact cross-document substring repetition: the hash-bucket
    reading of exact-substring dedup (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better") — every length-``n``
    token window is hashed; a window whose hash appears in ≥
    ``min_docs`` distinct documents is a duplicated span, and each
    doc reports its duplicated-window fraction (the removal signal;
    the paper's suffix-array form additionally recovers maximal span
    extents — the bucket form is the shuffle-friendly screen that
    feeds it).

    Shape: the CPU-heavy narrow stage (tokenize → shingle → hash)
    runs ONCE into a persisted (id, hash-array) table — ~4 B/window,
    spill-backed — because three consumers branch from it (the
    dup-hash aggregate, the join-back, and the per-doc window count)
    and Catalyst's column pruning diverges the branch plans so
    ReuseExchange can't dedupe them. Every exchange after that is
    int-keyed — the window-hash groupBy (count-distinct-docs; safe on
    hot boilerplate hashes because nothing per-key is materialized),
    the join back on the same key (AQE handles skew), one per-doc
    count. Returns every doc: (id, n_windows, n_dup_windows,
    dup_ratio).
    """
    sh = word_shingles(tokens(F.col(text_col)), n)
    harr = (
        ensure_min_parallelism(docs)
        .select(F.col(id_col), F.transform(sh, md5_hash32).alias("_h"))
        .persist()
    )
    d = harr.select(F.col(id_col), F.posexplode("_h").alias("pos", "h"))
    dup = (
        d.groupBy("h")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .where(F.col("nd") >= min_docs)
        .select("h")
    )
    per_doc = (
        d.join(dup, on="h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    base = harr.select(F.col(id_col), F.size("_h").alias("n_windows"))
    return base.join(per_doc, on=id_col, how="left").select(
        F.col(id_col),
        F.col("n_windows"),
        F.coalesce(F.col("n_dup_windows"), F.lit(0)).alias("n_dup_windows"),
        F.round(
            F.coalesce(F.col("n_dup_windows"), F.lit(0))
            / F.greatest(F.col("n_windows"), F.lit(1))
            + F.lit(1e-9),
            6,
        ).alias("dup_ratio"),
    )


__all__ = [
    "exact_duplicates",
    "substring_dup_stats",
    "doc_shingles",
    "doc_shingle_hashes",
    "minhash_signatures",
    "minhash_signatures_docs",
    "ngram_jaccard_pairs_docs",
    "lsh_candidate_pairs",
    "connected_components",
    "ngram_jaccard_pairs",
    "simhash",
    "MINHASH_PERMS",
    "MINHASH_PRIME",
    "md5_hash64",
    "simhash_near_pairs",
    "prefix_filtered_jaccard_pairs",
]


_SIMHASH_SIG_CACHE: list = []


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 24,
    k: int = 2,
    max_bucket: int | None = None,
    hash_bits: int = 32,
) -> DataFrame:
    """All document pairs within SimHash Hamming distance ``k`` — the
    Manku et al. 2007 (Google web-crawl dedup) pigeonhole search.
    ``sim_hyperplane_lsh`` pairs only IDENTICAL signatures; this finds
    near-misses: split the ``bits``-wide signature into ``k + 1``
    blocks — any pair at distance ≤ k must agree EXACTLY on at least
    one block (pigeonhole), so candidate generation is an equi
    self-join per block, never an all-pairs Hamming scan. Candidates
    verify the exact distance with one ``bit_count(xor)``.

    Shape: signature is one groupBy (the ``simhash`` plan), blocks a
    narrow posexplode, candidates ONE shuffle on (block_idx,
    block_value), verify in-row. Lossless at distance ≤ k by the
    pigeonhole argument. Scale knobs: wider signatures / more blocks
    shrink bucket populations (bucket size tracks docs per
    block-value, the same contract as LSH banding's ``max_bucket``) —
    and ``max_bucket`` ENFORCES the bound: a (block, value) bucket of
    b docs emits up to b² candidate rows, so one boilerplate-heavy
    bucket (narrow signatures over short templated docs) otherwise
    dominates the stage. Over-populated buckets are dropped BEFORE
    the self-join via a linear groupBy-count + equi join-back (never
    materializing the bucket), trading recall for boundedness exactly
    like ``lsh_candidate_pairs``: a dropped pair is lost only if that
    bucket was its ONLY agreeing block, so true near-dups usually
    survive through their other ``k`` blocks. ``None`` (default)
    keeps the exact pigeonhole guarantee.
    """
    n_blocks = k + 1
    # FRACTIONAL block widths (r10, VERDICT item 3 — the same 1-bit
    # resolution the LSH chains got as quarter-steps): the signature's
    # ``bits`` need not divide evenly; the first bits % n_blocks
    # blocks carry one extra bit. Pigeonhole is width-agnostic (k+1
    # disjoint blocks still force agreement on one), and per-block
    # candidate volume n²/2^w_j interpolates in ~2^(1/(k+1)) steps
    # per added bit instead of jumping 2× per whole-block-width
    # increment (the measured 9.4×/decade sawtooth of the integral
    # form). bits % n_blocks == 0 reproduces the legacy equal split
    # bit-for-bit — every recorded ≤ 8192-doc result is unchanged.
    base_w = bits // n_blocks
    rem = bits % n_blocks
    widths = [base_w + (1 if j < rem else 0) for j in range(n_blocks)]
    offs = [j * base_w + min(j, rem) for j in range(n_blocks)]
    sig = simhash(
        docs, id_col=id_col, text_col=text_col, bits=bits, hash_bits=hash_bits
    )
    if max_bucket is not None:
        # The cap branches the plan (bucket census + join-back), which
        # would recompute the corpus-wide signature groupBy once per
        # branch — persist it (1 row/doc, two longs). Same single-slot
        # eviction contract as the prefix-join base cache.
        sig = sig.persist()
        while _SIMHASH_SIG_CACHE:
            try:
                _SIMHASH_SIG_CACHE.pop().unpersist()
            except Exception:
                pass  # stale handle from a stopped session
        _SIMHASH_SIG_CACHE.append(sig)
    blocks = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), offs[j]).bitwiseAND(
                        F.lit((1 << widths[j]) - 1)
                    )
                    for j in range(n_blocks)
                ]
            )
        ).alias("j", "bv"),
    )
    if max_bucket is not None:
        sizes = blocks.groupBy("j", "bv").agg(F.count(F.lit(1)).alias("_bn"))
        blocks = blocks.join(
            sizes.where(F.col("_bn") <= max_bucket).select("j", "bv"),
            ["j", "bv"],
        )
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id_l"),
            F.col(f"b.{id_col}").alias("doc_id_r"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    return cand.select(
        "doc_id_l",
        "doc_id_r",
        F.expr("bit_count(s1 ^ s2)").alias("hamming"),
    ).where(F.col("hamming") <= k)
