"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, plus a
partition-pruned (IVF-style) variant as the scale path: with a coarse
bucket assignment column, the search join only touches same-bucket
rows — at 100 TB that's the difference between an O(n·q) cross join
and bucket-local probes. All vector math is JVM higher-order
functions (zip_with/aggregate) — no Python in the loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions.arrays import dot, norm, to_double_array
from weather4cast_bigdata_spark.partitioning import ensure_scan_parallelism


def _scored(queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, on=None) -> DataFrame:
    # Norms are attached PER VECTOR before the pairing join (r10):
    # computing cosine(qv, cv) per pair re-folds norm(qv)/norm(cv)
    # for every pair a vector appears in — 3 HOF folds per pair where
    # 1 suffices. The per-pair expression is now one dot fold + a
    # multiply/divide over the carried norms; values are bit-identical
    # (same fold on the same input, IEEE ops in the same order), so
    # every recorded oracle hash is unchanged.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
        *([F.col(c) for c in on] if on else []),
    ).withColumn("_qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("item_id"),
        to_double_array(F.col(vec_col)).alias("cv"),
        *([F.col(c_) for c_ in on] if on else []),
    ).withColumn("_cn", norm(F.col("cv")))
    joined = q.join(c, on=list(on), how="inner") if on else q.crossJoin(c)
    # +1e-9 tie-break epsilon before rounding (see plans.registry
    # numeric policy): summation order differs across engines.
    return joined.where(F.col("query_id") != F.col("item_id")).select(
        "query_id",
        "item_id",
        F.round(
            F.try_divide(
                dot(F.col("qv"), F.col("cv")), F.col("_qn") * F.col("_cn")
            )
            + F.lit(1e-9),
            6,
        ).alias("cos_sim"),
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: every query scored against the whole
    corpus, ``row_number`` per query. Ties break on item id
    (deterministic)."""
    scored = _scored(queries, corpus, id_col, vec_col)
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cos_sim")
    )


def cosine_topk_bucketed(
    queries: DataFrame,
    corpus: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """IVF-style ANN: score only within the same coarse bucket
    (precomputed assignment column ≈ nearest-centroid list). The join
    becomes an equi join on the bucket key — shuffle-partitioned,
    bucket-local, no cross join."""
    scored = _scored(queries, corpus, id_col, vec_col, on=[bucket_col])
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cos_sim")
    )


def near_dup_pairs(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate detection: same-bucket
    self-join (a<b dedup of the pair space), keep pairs whose rounded
    cosine ≥ threshold. The bucket key makes the candidate space
    bucket-local — the embedding analog of LSH banding."""
    scored = _scored(df, df, id_col, vec_col, on=[bucket_col])
    return (
        scored.where(
            (F.col("query_id") < F.col("item_id"))
            & (F.col("cos_sim") >= F.lit(threshold))
        )
        .select(
            F.col("query_id").alias("a_id"),
            F.col("item_id").alias("b_id"),
            "cos_sim",
        )
    )


def adaptive_n_planes(
    n: int, target_bucket: int = 8, base: int = 0, max_extra: int = 24
) -> int:
    """Scale-adaptive LSH resolution: the smallest plane count that
    keeps E[bucket depth] ≤ ``target_bucket`` as the corpus grows —
    ``base + ceil(log2(n / target_bucket))``, computed as a chain of
    INTEGER comparisons (extra = #{k ≥ 1 : n > target·2^(k-1)}) so a
    SQL oracle restates it bit-exactly with no float log in sight.
    Fixed planes make within-bucket verify work quadratic in corpus
    size (bucket depth ∝ n); deriving the count from a cheap
    ``df.count()`` keeps depth — and therefore per-bucket pair work —
    constant, so total verify cost scales ~linearly with the corpus.
    ``max_extra`` = 24 covers ~134 M rows at the default target; at
    true 100 TB scale extend the chain (each step is one comparison).
    """
    extra = 0
    while extra < max_extra and n > target_bucket * (1 << extra):
        extra += 1
    return base + extra


def adaptive_n_planes_sql(
    count_sql: str, target_bucket: int = 8, base: int = 0, max_extra: int = 24
) -> str:
    """The SQL restatement of :func:`adaptive_n_planes`: a scalar
    subquery summing the same integer comparisons over the same
    thresholds, so oracle and plan derive the identical plane count
    from the identical corpus count."""
    terms = " + ".join(
        f"(CASE WHEN c > {target_bucket * (1 << k)} THEN 1 ELSE 0 END)"
        for k in range(max_extra)
    )
    return f"(SELECT {base} + {terms} FROM (SELECT ({count_sql}) AS c))"


#: Planes carried per bigint word of a WIDE signature. A single
#: bigint key holds ≤60 sign bits; wider signatures (the banded
#: construction's total plane count past ~8·2^14.75 rows) split into
#: ceil(P / 60) words — see hyperplane_bucket_words /
#: band_key_words. 60 (not 62) leaves shift arithmetic comfortably
#: inside the sign bit on both engines.
SIGNATURE_WORD_BITS = 60

#: Cap of the fractional (1/4-step) plane chains. r8's cap was 60 —
#: one bigint word — and measured as the REAL binding constraint at
#: the 100× lake (SCALING.md §7c: sim_lsh_multiprobe's chain wanted
#: depth 80/17 ≈ 4.7 at 200 k vectors but clamped at Q=60, work/row
#: growing by the uncompensated probe fan-out, 12.8× wall per
#: decade). 120 quarter-steps = two words for the banded
#: construction (its total plane count is Q) and still ONE word for
#: the single-signature keys (they read only Q//4 + 1 ≤ 31 planes),
#: covering ~8·2^29.75 ≈ 7×10⁹ rows per band at target 8 before the
#: cap binds again.
MAX_QUARTER_STEPS = 120


def _fractional_thresholds(
    n_bands: int, target_bucket: int, max_total: int
) -> list[int]:
    """Integer thresholds of the fractional (1/n_bands-step) plane
    chain: t_k = floor(target · 2^((k-1)/n_bands)). For integer
    corpus counts ``n > target·2^((k-1)/n_bands)`` ⟺ ``n > t_k``, so
    the chain is pure integer comparison; both engines embed the SAME
    Python-computed literals, so a 1-ulp float wobble in the
    irrational powers cannot diverge them."""
    return [
        int(target_bucket * 2.0 ** ((k - 1) / n_bands))
        for k in range(1, max_total + 1)
    ]


def adaptive_total_planes(
    n: int, n_bands: int = 4, target_bucket: int = 8, max_total: int = MAX_QUARTER_STEPS
) -> int:
    """Fractional-resolution total plane count for the BANDED
    construction: the smallest total Q with sum-of-band-widths
    granularity 1 plane — i.e. resolution steps of 2^(1/n_bands) ≈
    1.19× (n_bands=4) in per-band bucket depth, vs the 2× step of
    the integral single-signature chain. Q = #{k ≤ max_total :
    n > target·2^((k-1)/n_bands)}; with :func:`band_layout`
    splitting Q into widths W/W+1, the geometric-mean band depth
    stays within 2^(1/n_bands) of target at ANY corpus size — the
    flattened version of the ±2× sawtooth SCALING.md §7 documents
    for the integral variants. max_total = MAX_QUARTER_STEPS (120,
    raised from one bigint word's 60 in r9): the banded
    construction's Q-plane signature spans ceil(Q/60) bigint words
    (hyperplane_bucket_words) while the single-signature keys read
    only Q//4 + 1 ≤ 31 planes — always word 0. The 60 cap was
    measured binding at the 100× lake (SCALING.md §7c)."""
    q = 0
    for t in _fractional_thresholds(n_bands, target_bucket, max_total):
        if n > t:
            q += 1
        else:
            break
    return q


def adaptive_total_planes_sql(
    count_sql: str, n_bands: int = 4, target_bucket: int = 8, max_total: int = MAX_QUARTER_STEPS
) -> str:
    """SQL restatement of :func:`adaptive_total_planes` — same
    literal thresholds, same integer comparisons, summed in a scalar
    subquery over the same corpus count. The sum is CHUNKED into
    parenthesized groups of 32: integer addition is associative, and
    a flat 120-term left-nested chain exceeds DuckDB's 128-deep
    expression-binder recursion limit (the r9 cap raise tripped
    it)."""
    terms = [
        f"(CASE WHEN c > {t} THEN 1 ELSE 0 END)"
        for t in _fractional_thresholds(n_bands, target_bucket, max_total)
    ]
    chunks = [
        "(" + " + ".join(terms[i : i + 32]) + ")"
        for i in range(0, len(terms), 32)
    ]
    return f"(SELECT {' + '.join(chunks)} FROM (SELECT ({count_sql}) AS c))"


def fractional_split(
    n: int, n_bands: int = 4, target_bucket: int = 8, max_total: int = MAX_QUARTER_STEPS
) -> tuple[int, int]:
    """Fractional resolution for the SINGLE-SIGNATURE constructions
    (exact-collision and multiprobe) — the r7 weak-flag port: derive
    the 1/4-step total Q from :func:`adaptive_total_planes` and split
    it as ``(p, r) = (Q // 4, Q % 4)``. The signature reads ``p + 1``
    planes; ``p`` low bits form the bucket PREFIX and bit ``p`` is an
    EXTENSION bit that only the ``r/4`` fraction of prefixes selected
    by ``prefix % 4 < r`` actually key on (see
    :func:`fractional_key`). One quarter-octave of corpus growth
    increments Q by one, moving only ``r`` — i.e. splitting one more
    quarter of the buckets in two — so E[bucket depth] steps by
    ~2^(1/4) ≈ 1.19× instead of the integral chain's 2× sawtooth
    (SCALING.md §7; measured 3.21×/4.07× wall at 3× data for the
    integral variants vs 2.35× for the fractional banded sibling).

    ``prefix % 4`` (the signs of planes 0 and 1) is the split
    selector because it is a pure function of the bucket id that both
    engines restate with one modulo — on sign-balanced data each
    residue class holds ~1/4 of the rows; a corpus collapsed onto one
    side of planes 0/1 degrades the mixture toward pure-``p`` or
    pure-``p+1`` width, which is exactly the old integral behavior
    (never worse), and the hot-bucket census cap still bounds the
    worst key."""
    q = adaptive_total_planes(
        n, n_bands=n_bands, target_bucket=target_bucket, max_total=max_total
    )
    return q // n_bands, q % n_bands


#: Work budget of the multiprobe rule per row: fan-out × depth.
#: 80 = 8 (the family's target bucket depth) × 10 (the probe
#: fan-out p+2 at the 2 k-vector bench-reference corpus), so the
#: normalized split reproduces the depth-constant split exactly at
#: the bench SF (n=2000 → (8, 0) either way) and gets gently FINER
#: beyond it (depth 6.1 at 20 k, 5.5 at 60 k) — constant probe work
#: per row, paid in the recall knob, which stays above the integral
#: r7 rule at every measured scale (its over-resolved chain ran
#: depth 4.9 at 20 k; see SCALING.md §7b).
MULTIPROBE_WORK_TARGET = 80


def fractional_split_multiprobe(
    n: int, n_bands: int = 4, max_total: int = MAX_QUARTER_STEPS
) -> tuple[int, int]:
    """Fan-out-normalized fractional split for the MULTIPROBE rule.

    :func:`fractional_split` holds E[bucket depth] constant — right
    for exact collision (work/row = depth), but multiprobe work/row
    is ``(p+2)·depth``: the p prefix flips + extension flip each
    probe a depth-sized bucket, so constant depth still drifts
    super-linear by the log-n fan-out (measured 3.45× wall at 3×
    data AFTER the sawtooth fix — the fan-out term isolated).
    Normalization: run the same quarter-step integer chain with the
    COUNT side multiplied by the fan-out, against thresholds scaled
    by the work target —

        Q = #{k ≤ max: n·(p₁+2) > floor(T·2^((k-1)/4))},
        T = MULTIPROBE_WORK_TARGET, p₁ = fractional_split(n)'s
        prefix width

    — giving depth ≈ T/(p₁+2), i.e. work/row ≈ T = const at
    every corpus size. Still pure integer comparisons (both factors
    are integers, thresholds are Python-computed literals), so the
    SQL oracle restates it from the same count. Depth shrinks only
    as 1/log(n) (13 → 6.9 from 20 k to 60 k), and at gate scales
    the split is COARSER than the exact-collision one (depth 13 vs
    8 at n=500), so per-pair recall only rises vs the
    depth-constant form."""
    q1 = adaptive_total_planes(n, n_bands=n_bands, max_total=max_total)
    p1 = q1 // n_bands
    return fractional_split(
        n * (p1 + 2),
        n_bands=n_bands,
        target_bucket=MULTIPROBE_WORK_TARGET,
        max_total=max_total,
    )


def fractional_split_multiprobe_sql(
    count_sql: str, n_bands: int = 4, max_total: int = MAX_QUARTER_STEPS
) -> str:
    """SQL restatement of :func:`fractional_split_multiprobe`'s
    TOTAL (the caller derives p = Q//4, r = Q%4): the inner chain
    computes p₁ from the same thresholds as
    :func:`adaptive_total_planes_sql`, the outer chain compares the
    fan-out-multiplied count against the work-target thresholds."""
    q1 = adaptive_total_planes_sql(count_sql, n_bands=n_bands, max_total=max_total)
    boosted = (
        f"SELECT CAST((SELECT ({count_sql})) AS BIGINT)"
        f" * ((({q1}) // {n_bands}) + 2)"
    )
    return adaptive_total_planes_sql(
        boosted,
        n_bands=n_bands,
        target_bucket=MULTIPROBE_WORK_TARGET,
        max_total=max_total,
    )


def fractional_key_parts(prefix: Column, ext: Column, r: int) -> Column:
    """The key rule of the fractional construction from its parts:
    ``prefix·2 + (unmerged(prefix) ? ext : 0)`` with
    ``unmerged(prefix) ⟺ prefix % 4 < r`` — the ONE place the rule
    lives, so the probe generator (which flips prefixes and
    extension bits before keying) cannot desynchronize from the
    exact-collision key."""
    unmerged = (prefix % 4) < F.lit(r)
    return prefix * 2 + F.when(unmerged, ext).otherwise(F.lit(0).cast("bigint"))


def fractional_key(hp_col: Column, p: int, r: int) -> Column:
    """Bucket key of the fractional single-signature construction:
    ``prefix·2 + (unmerged(prefix) ? bit_p : 0)`` where ``prefix`` is
    the low ``p`` bits of the (p+1)-plane signature and
    ``unmerged(prefix) ⟺ prefix % 4 < r``. Merged prefixes key on
    ``p`` planes (depth n/2^p), unmerged ones on ``p+1`` (depth
    n/2^(p+1)); the r/4 mixture holds the EXPECTED depth within ±6%
    of target across a whole octave. ``p``/``r`` are Python literals
    (derived driver-side from one bounded count), so the SQL oracle
    restates the key with the same integer arithmetic."""
    prefix = hp_col.bitwiseAND(F.lit(((1 << p) - 1)).cast("bigint"))
    ext = F.shiftright(hp_col, p).bitwiseAND(F.lit(1).cast("bigint"))
    return fractional_key_parts(prefix, ext, r)


def band_layout(total: int, n_bands: int = 4) -> list[tuple[int, int]]:
    """Split a total plane count into ``n_bands`` (offset, width)
    bit-slices whose widths differ by at most one: the first
    ``total % n_bands`` bands get ``total//n_bands + 1`` planes, the
    rest ``total//n_bands``. Restated in SQL as
    off_b = b·(q//4) + least(b, q%4), w_b = q//4 + (b < q%4)."""
    w, m = divmod(total, n_bands)
    out, off = [], 0
    for i in range(n_bands):
        wi = w + (1 if i < m else 0)
        out.append((off, wi))
        off += wi
    return out


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane matrix: sign p,d is drawn
    from the parity of ``md5(f"{p}_{d}")``. Driver-side constants —
    the same matrix is embedded as literals in the SQL oracle, so both
    engines share the planes bit-exactly, and at any corpus size the
    plane table stays a few KB broadcast inside the plan."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{p}_{d}".encode()).hexdigest()[:8], 16) % 2 == 0 else -1
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def hyperplane_bucket(vec_col: Column, signs) -> Column:
    """Random-hyperplane LSH bucket (SimHash for embeddings): bit p =
    [⟨v, s_p⟩ ≥ 0], composed into one integer. Cosine-similar vectors
    collide with probability (1 - θ/π)^P — the textbook complement to
    IVF bucketing. Pure JVM higher-order expressions; the +1e-9 nudge
    keeps the sign decision identical cross-engine when a dot product
    lands within float noise of zero (numeric policy #3).

    ONE ``aggregate`` over a literal plane TABLE (array of arrays)
    with a (sum, power-of-two) struct accumulator — not a chain of P
    per-plane expressions: the chained form built P nested
    zip_with/aggregate trees through py4j, costing ~4 s of
    DRIVER-side plan construction at 32 planes before a single row
    moved (measured on the banded query; the wide adaptive widths
    made it the dominant cost). Per-plane math is unchanged
    (left-to-right zip_with dot, +1e-9 nudge), so buckets are
    bit-identical to the chained form and to the SQL oracle. The
    plane table is emitted as ONE SQL string (a single JVM parse —
    per-literal Column construction cost a py4j round trip for each
    of the P×64 signs, the CMS counter table lesson applied here)."""
    planes = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{float(x)}D" for x in s) + ")" for s in signs
        )
        + ")"
    )
    zero = F.struct(
        F.lit(0).cast("bigint").alias("s"), F.lit(1).cast("bigint").alias("pw")
    )

    def step(acc, sv):
        dot = F.aggregate(
            F.zip_with(vec_col, sv, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda a2, v: a2 + v,
        )
        return F.struct(
            (
                acc["s"]
                + F.when(dot + F.lit(1e-9) >= 0, acc["pw"]).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("s"),
            (acc["pw"] * F.lit(2).cast("bigint")).alias("pw"),
        )

    return F.aggregate(planes, zero, step, lambda acc: acc["s"])


def hyperplane_bucket_arrow(vec_col: Column, signs) -> Column:
    """Arrow-vectorized twin of :func:`hyperplane_bucket`: one numpy
    matmul per batch instead of P×64 interpreted higher-order-function
    ops per row. HOF lambdas never enter whole-stage codegen, and at
    200 k vectors the interpreted signature was 30.6 s of the 69.6 s
    query wall (SCALING.md §7c); this kernel measured the same stage
    at 0.69 s vs 16.1 s warm (23×) with ZERO bucket mismatches across
    the 200 k corpus. Per-plane math is the same IEEE double dot with
    the same +1e-9 sign nudge — numpy's pairwise/BLAS summation can
    reorder additions, but so can DuckDB's aggregate on the oracle
    side; the nudge is exactly the tolerance that makes the sign
    decision stable under ~1e-16 reassociation noise (numeric policy
    #3), and the expression twin stays in-tree with a parity test
    pinning the two forms against each other. Production callers use
    this form; :func:`hyperplane_bucket` remains the declarative
    reference (and the form the SQL oracle textually mirrors)."""
    if not signs:
        return F.lit(0).cast("bigint")
    # one bigint holds ≤ SIGNATURE_WORD_BITS sign bits — wider
    # signatures go through hyperplane_bucket_words_arrow
    assert len(signs) <= SIGNATURE_WORD_BITS, len(signs)
    import numpy as np
    import pandas as pd

    s_t = np.asarray(signs, dtype=np.float64).T  # (dim, P)
    pows = 1 << np.arange(len(signs), dtype=np.int64)

    @F.pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        m = _vector_matrix(v, s_t.shape[0])
        bits = (m @ s_t) + 1e-9 >= 0
        return pd.Series((bits * pows).sum(axis=1).astype(np.int64))

    return _bucket(vec_col)


def _vector_matrix(v, dim: int):
    """Batch-of-embeddings → (n, dim) float64 matrix for the Arrow
    signature kernels. The fast path is one np.asarray over the
    uniform-width batch; a batch with ragged or short rows (which
    np.asarray would turn into an object array, crashing the matmul
    with an opaque shape error) falls back to explicit pad/truncate
    with 0-fill — the same semantics as the declarative twin and the
    oracle's ``r.i <= len(embedding)`` guard, where a missing
    dimension contributes 0 to every plane dot."""
    import numpy as np

    rows = v.tolist()
    try:
        m = np.asarray(rows, dtype=np.float64)
        if m.ndim == 2 and m.shape[1] == dim:
            return m
    except ValueError:
        pass
    m = np.zeros((len(rows), dim), dtype=np.float64)
    for i, row in enumerate(rows):
        a = np.asarray(row[:dim], dtype=np.float64)
        m[i, : a.shape[0]] = a
    return m


def signature_n_words(
    n_planes: int, word_bits: int = SIGNATURE_WORD_BITS
) -> int:
    """Words of a wide signature: ceil(P / word_bits), minimum 1."""
    return max(1, -(-n_planes // word_bits))


#: Corpus size where the Arrow signature kernel starts to win. The
#: pandas_udf round-trip is a FIXED per-query cost (~0.2-0.4 s at
#: local[32]) that regressed the 2 k-vector bench rows 15-45% in r8
#: while winning 23× on the signature stage at 200 k vectors
#: (SCALING.md §7c); below this row count the declarative
#: higher-order-function form — the form the SQL oracle textually
#: mirrors, parity-pinned against the kernel — is both faster and
#: simpler. 10 k ≈ where the interpreted per-row cost (p·dim HOF ops
#: × rows) first exceeds the kernel's fixed overhead with margin.
ARROW_SIGNATURE_MIN_ROWS = 10_000

#: ... or when rows × planes crosses this (measured r9, sf0.1 = 2 k
#: rows: a 90-plane signature ran 2.45 s expression vs 1.24 s Arrow —
#: the interpreted cost is per plane-dot, the kernel's fixed cost is
#: per query — while at ≤16 planes the two are within window noise).
ARROW_SIGNATURE_MIN_WORK = 100_000


def _use_arrow_signature(n_rows: int | None, n_planes: int) -> bool:
    """Signature-form policy (VERDICT r8 item 5): the Arrow matmul
    kernel when the corpus is large (ARROW_SIGNATURE_MIN_ROWS), the
    per-query plane-dot work is large (ARROW_SIGNATURE_MIN_WORK), or
    the size is unknown (the scale-safe default); the declarative
    expression form otherwise — it avoids the pandas_udf round-trip
    that regressed the 2 k-vector bench rows in r8. Both forms are
    bit-identical by the parity tests; this only picks the cheaper
    engine for the shape."""
    return (
        n_rows is None
        or n_rows >= ARROW_SIGNATURE_MIN_ROWS
        or n_rows * max(n_planes, 1) >= ARROW_SIGNATURE_MIN_WORK
    )


def hyperplane_bucket_auto(
    vec_col: Column, signs, n_rows: int | None
) -> Column:
    """Form-picking wrapper over the two parity-pinned signature
    kernels — see :func:`_use_arrow_signature`."""
    if _use_arrow_signature(n_rows, len(signs)):
        return hyperplane_bucket_arrow(vec_col, signs)
    return hyperplane_bucket(vec_col, signs)


def hyperplane_bucket_words_auto(
    vec_col: Column, signs, n_rows: int | None
) -> Column:
    """Multi-word twin of :func:`hyperplane_bucket_auto`."""
    if _use_arrow_signature(n_rows, len(signs)):
        return hyperplane_bucket_words_arrow(vec_col, signs)
    return hyperplane_bucket_words(vec_col, signs)


def hyperplane_bucket_words(
    vec_col: Column, signs, word_bits: int = SIGNATURE_WORD_BITS
) -> Column:
    """Multi-word wide signature — the r9 extension past the one-
    bigint 60-plane cap (SCALING.md §7c, the measured binding
    constraint at the 100× lake): word w carries the sign bits of
    planes [w·word_bits, (w+1)·word_bits) as one bigint, so a
    P-plane signature is an ARRAY of ceil(P/60) bigints. Declarative
    reference form — each word is one :func:`hyperplane_bucket` over
    its plane slice (same per-plane IEEE dot + 1e-9 nudge), and the
    SQL oracle restates each word as an independent CASE·2^(p−60w)
    sum. Word 0 of a words signature is BIT-IDENTICAL to the legacy
    single-bigint bucket over the first min(P, 60) planes."""
    n_words = signature_n_words(len(signs), word_bits)
    return F.array(
        *[
            hyperplane_bucket(
                vec_col, signs[w * word_bits : (w + 1) * word_bits]
            )
            for w in range(n_words)
        ]
    )


def hyperplane_bucket_words_arrow(
    vec_col: Column, signs, word_bits: int = SIGNATURE_WORD_BITS
) -> Column:
    """Arrow-vectorized twin of :func:`hyperplane_bucket_words`: the
    sign-bit matrix comes from ONE numpy matmul per batch (the
    :func:`hyperplane_bucket_arrow` kernel shape — measured 23× on
    the signature stage at 200 k vectors), then folds into per-word
    bigints. Same +1e-9 nudge, same word layout; the expression form
    stays the parity-tested declarative reference."""
    import numpy as np
    import pandas as pd

    n_words = signature_n_words(len(signs), word_bits)
    if not signs:
        return F.array(F.lit(0).cast("bigint"))
    s_t = np.asarray(signs, dtype=np.float64).T  # (dim, P)
    word_pows = [
        (
            w * word_bits,
            min(len(signs), (w + 1) * word_bits) - w * word_bits,
        )
        for w in range(n_words)
    ]

    @F.pandas_udf("array<long>")
    def _bucket_words(v: pd.Series) -> pd.Series:
        m = _vector_matrix(v, s_t.shape[0])
        bits = (m @ s_t) + 1e-9 >= 0
        words = [
            (
                bits[:, off : off + width]
                * (1 << np.arange(width, dtype=np.int64))
            ).sum(axis=1)
            for off, width in word_pows
        ]
        stacked = np.stack(words, axis=1).astype(np.int64)
        return pd.Series(list(stacked))

    return _bucket_words(vec_col)


def hyperplane_bucket_probe_arrow(
    vec_col: Column, signs, prefix_planes: int, n_probes: int
) -> Column:
    """Signature + bounded probe mask in ONE Arrow kernel: returns
    struct(hp, probe_mask) where ``hp`` is the usual sign-bit bucket
    over all ``signs`` and ``probe_mask`` has bit i set for the
    ``n_probes`` PREFIX planes (i < prefix_planes) whose dot product
    sits closest to the hyperplane — the planes most likely to flip
    for a borderline neighbor (Lv et al. 2007 multi-probe LSH). The
    closeness order is over round(|dot| + 1e-9, 6) with the plane
    index as tiebreak — quantized here as
    floor((|dot| + 1e-9)·10⁶ + 0.5), the exact positive-value
    half-up the SQL round() computes (numpy's own round is
    half-EVEN), so the oracle's row_number restatement ranks
    identically under float-summation-order noise (the same
    nudge-then-round policy as every cosine cut).

    Known residual risk (ADVICE r9, accepted under the repo's
    numeric policy): the 1e-9 nudge protects FIXED thresholds, not
    this data-relative rank boundary — if two different planes'
    |dot| values straddle a 1e-6 quantization edge by less than
    float-summation noise, numpy (one matmul) and the oracle
    (per-dimension sum) can rank them oppositely and flip the
    boundary probe. Same class as the round-6 cosine-cut risk;
    tests/test_similarity.py keeps a tie-heavy fixture on this
    kernel."""
    import numpy as np
    import pandas as pd

    assert signs and len(signs) <= SIGNATURE_WORD_BITS
    assert prefix_planes <= len(signs)
    s_t = np.asarray(signs, dtype=np.float64).T  # (dim, P)
    pows = 1 << np.arange(len(signs), dtype=np.int64)
    t = min(n_probes, prefix_planes)

    @F.pandas_udf("struct<hp: long, probe_mask: long>")
    def _sig_probe(v: pd.Series) -> pd.DataFrame:
        m = _vector_matrix(v, s_t.shape[0])
        dots = m @ s_t
        hp = (((dots + 1e-9) >= 0) * pows).sum(axis=1).astype(np.int64)
        key = np.floor(
            (np.abs(dots[:, :prefix_planes]) + 1e-9) * 1e6 + 0.5
        )
        # lexicographic (quantized |dot|, plane idx): argsort is
        # stable, so ties break toward the lower plane index
        order = np.argsort(key, axis=1, kind="stable")[:, :t]
        mask = np.zeros(len(hp), dtype=np.int64)
        for j in range(order.shape[1]):
            mask |= np.int64(1) << order[:, j].astype(np.int64)
        return pd.DataFrame({"hp": hp, "probe_mask": mask})

    return _sig_probe(vec_col)


def band_key_words(
    word_cols: list[Column],
    off: int,
    width: int,
    word_bits: int = SIGNATURE_WORD_BITS,
) -> Column:
    """Bit-slice [off, off+width) of a multi-word signature as one
    bigint band key. ``off``/``width`` are Python literals (the
    driver-side band layout), so word selection and the straddle
    split are resolved at plan-build time: a band lies in one word,
    or spans exactly two (width ≤ 31 < word_bits). The SQL oracle
    restates the same split with CASE arithmetic over the same
    layout scalars."""
    lo_word = off // word_bits
    lo_off = off % word_bits
    lo_bits = min(word_bits - lo_off, width)
    key = F.shiftright(word_cols[lo_word], lo_off).bitwiseAND(
        F.lit((1 << lo_bits) - 1).cast("bigint")
    )
    if width > lo_bits:  # straddles into the next word
        hi = word_cols[lo_word + 1].bitwiseAND(
            F.lit((1 << (width - lo_bits)) - 1).cast("bigint")
        )
        key = key + F.shiftleft(hi, lo_bits)
    return key


def near_dup_pairs_hyperplane(
    df: DataFrame,
    signs=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    dim: int = 64,
    target_bucket: int = 8,
    n_rows: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs with random-hyperplane LSH candidate
    generation: bucket on the P-bit hyperplane signature, then verify
    cosine within buckets. No precomputed label or trained centroids
    needed — the data-independent LSH variant of
    :func:`near_dup_pairs`; recall is tuned by P (fewer planes = more
    candidates) or by multi-probe/banding at very high P.

    ``signs=None`` (the default) derives the resolution from the
    corpus count via :func:`fractional_split` — one bounded driver
    action (a count aggregate) buys a FRACTIONAL (1/4-step) width:
    the signature reads p+1 planes, merged prefixes bucket on p bits
    and the ``prefix % 4 < r`` quarter-fraction on p+1, so E[bucket
    depth] — and with it per-bucket verify work — stays within ±6%
    of target at ANY corpus size instead of sawtoothing ±2× per data
    octave (the r7 weak flag, SCALING.md §7). The single-signature
    recall trade (genuine near-dups collide with probability
    ≈(1-θ/π)^p) is the documented cost; multi-probe or banding over
    the same signature is the production recall knob. An explicit
    ``signs`` keeps the legacy exact-collision-on-len(signs)-planes
    semantics (used by callers that manage their own resolution,
    e.g. the label-composite dedup_embedding_cosine). ``n_rows``
    (when the caller already knows the corpus count — e.g. from
    parquet footer metadata, catalog.table_rows) skips the count
    job."""
    n = n_rows
    if signs is None:
        if n is None:
            n = df.count()
        p, r = fractional_split(n, target_bucket=target_bucket)
        # the fractional key always fits ONE bigint word: p = Q//4
        # ≤ MAX_QUARTER_STEPS//4 = 30 planes + the extension bit
        assert p + 1 <= SIGNATURE_WORD_BITS, (p, SIGNATURE_WORD_BITS)
        # r = 0 never keys on the extension bit — skip its plane (the
        # signature is the dominant per-row cost; one unused plane is
        # +1/p of it for nothing)
        signs = hyperplane_signs(p + (1 if r else 0), dim)
        key = fractional_key(
            hyperplane_bucket_auto(F.col(vec_col), signs, n), p, r
        )
    else:
        key = hyperplane_bucket_arrow(F.col(vec_col), signs)
    df = ensure_scan_parallelism(df, n)
    bucketed = _cache_signatures(
        df.select(F.col(id_col), F.col(vec_col), key.alias("hp_bucket"))
    )
    # Verify-stage policy (VERDICT r8 weak flag #1): exact-collision
    # verify work is Σ bucket-depth², and on label-CLUSTERED corpora
    # dense cells split sub-uniformly as planes are added — measured
    # Σd² 14.5×/decade at the 100× lake while mean depth stayed flat
    # (SCALING.md §7c). The interpreted per-pair HOF join made that
    # second moment the wall-clock term (16.4× wall per decade); the
    # census-gated BLAS block-pair path computes the same pairs as
    # numpy matmuls inside applyInPandas — the Σd² work stays (it is
    # the candidate semantics) but runs at GFLOP speed, and buckets
    # past split_bucket spread over block-pair tasks so a dense cell
    # can never straggle one task. Small corpora keep the HOF join
    # (the declarative reference, faster under the applyInPandas
    # fixed overhead); both tails are pinned identical by
    # test_hyperplane_verify_paths_identical and the shared oracle.
    if n is not None and n < ARROW_SIGNATURE_MIN_ROWS:
        return near_dup_pairs(
            bucketed,
            "hp_bucket",
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
        )
    return near_dup_pairs_blas(
        bucketed,
        "hp_bucket",
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        split_bucket=4096,
    )



# One persisted signature frame at a time (the _PREFIX_BASE_CACHE
# pattern from dedup.py): the census, the anti-join probe, and both
# self-join sides all consume the bucketed frame, and the P-plane
# interpreted signature is the family's dominant per-row cost — an
# unpersisted frame would recompute it once per consumer (measured
# 3x at sf1). Each new invocation evicts the previous call's cache,
# so repeated calls hold at most one corpus-sized signature frame.
_SIG_CACHE: list = []


def _cache_signatures(bucketed: DataFrame) -> DataFrame:
    while _SIG_CACHE:
        try:
            _SIG_CACHE.pop().unpersist()
        except Exception:
            pass  # stale handle from a stopped session
    bucketed = bucketed.persist()
    _SIG_CACHE.append(bucketed)
    return bucketed


def _verify_pairs(
    cand: DataFrame,
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """Attach both vectors to DISTINCT candidate id-pairs and apply
    the shared rounded-cosine cut — the verify tail common to the
    probe/band candidate generators. Norms ride the vector
    projections (n folds), not the pair expression (2·pairs folds) —
    bit-identical values, ~3× less per-pair HOF work (r10; same
    rewrite as _scored)."""
    a = df.select(
        F.col(id_col).alias("a_id"), to_double_array(F.col(vec_col)).alias("qv")
    ).withColumn("_qn", norm(F.col("qv")))
    b = df.select(
        F.col(id_col).alias("b_id"), to_double_array(F.col(vec_col)).alias("cv")
    ).withColumn("_cn", norm(F.col("cv")))
    return (
        cand.join(a, on="a_id")
        .join(b, on="b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.try_divide(
                    dot(F.col("qv"), F.col("cv")), F.col("_qn") * F.col("_cn")
                )
                + F.lit(1e-9),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= F.lit(threshold))
    )


def near_dup_pairs_multiprobe(
    df: DataFrame,
    signs,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int = 4096,
    prefix_planes: int | None = None,
    split_r: int = 0,
    n_rows: int | None = None,
) -> DataFrame:
    """Multi-probe extension of :func:`near_dup_pairs_hyperplane` —
    the RECALL knob the adaptive plane count trades against: a pair
    is a candidate when its bucket PREFIXES differ in AT MOST ONE
    plane, not only on exact collision, so a borderline vector that
    flips a single near-zero dot product still meets its neighbor —
    at the cost of ONE explode replicating each row to p+2 probe
    keys. Candidate volume stays linear (bucket depth × (p+2)),
    never quadratic.

    FRACTIONAL resolution (``prefix_planes=p`` + ``split_r=r``, the
    r7 weak-flag port): keys are :func:`fractional_key` over a
    (p+1)-plane signature — merged prefixes (``prefix % 4 >= r``)
    bucket on p bits, the rest on p+1 — so E[depth], and with it
    per-probe join work, steps by ~1.19× per quarter-octave instead
    of the integral 2× sawtooth that measured 4.07× wall at 3× data
    (SCALING.md §7). The candidate rule in signature terms: with
    d = Hamming(prefix_a, prefix_b),
      d = 0  → candidate (the extension-flip probe covers unmerged
               pairs whose extension bits differ);
      d = 1  → candidate iff merged(prefix_a) OR merged(prefix_b)
               OR ext_a = ext_b;
      d ≥ 2  → not a candidate.
    ``prefix_planes=None`` keeps the legacy integral semantics
    (p = len(signs), r = 0: plain Hamming ≤ 1 on the full
    signature).

    Meeting rule (CANONICAL-DIRECTION probing, r12 — guide §2.3):
    side A carries its exact fractional key plus one probe per
    qualifying flip, side B carries the exact key only. Because the
    full-prefix rule is SYMMETRIC (unlike the bounded-T sibling,
    whose per-side probe masks force two-directional probing), each
    d = 1 pair needs only ONE of its two directional meetings, so a
    row emits:

    - UP prefix flips only (planes where its own bit is 0): for a
      pair differing in plane i, exactly the side with bit 0 probes,
      and the key match encodes the fractional meet condition
      against the TARGET prefix's layout — merged(target) always
      matches, unmerged(target) matches iff the ext bits agree;
    - DOWN prefix flips only where they rescue the one asymmetric
      case — own prefix UNMERGED, flipped prefix MERGED (only
      possible for planes 0/1, the ``% 4`` selector bits): the
      up-probing partner keys on (target prefix, own ext) against
      this row's two-ext merged bucket and always matches, but the
      REVERSE case (this row unmerged, ext differing) matches
      nothing, so the unmerged side must also reach down into the
      merged bucket;
    - the extension flip only when UNMERGED with ext = 0 (probing
      "up" to the ext = 1 sibling bucket; merged rows key both exts
      to one bucket, making their ext flip a no-op duplicate of the
      exact probe — the Σdepth² re-enumeration removed in r12).

    Every qualifying unordered pair meets EXACTLY once per probe
    class (d = 0 pairs twice, through both exact probes), the join
    enumerates ~half the meetings of the two-directional form, and
    the bare-id distinct collapses what multiplicity remains.
    Verification is the same rounded-cosine cut as every sibling.

    Hot-bucket guard (same contract as dedup.lsh_candidate_pairs'
    census-enforced cap): vectors whose EXACT key's bucket exceeds
    ``max_bucket`` are dropped from both sides before pairing — an
    adversarial corpus that collapses onto one signature can
    degrade recall (documented, one-sided) but can never make a
    task's pair work exceed max_bucket², and the adaptive width
    keeps E[depth] far below the cap on non-adversarial data so the
    guard never binds at any tested SF (oracle unaffected)."""
    p = len(signs) if prefix_planes is None else prefix_planes
    r = split_r
    # single-bigint signature by construction: p ≤ MAX_QUARTER_STEPS//4
    assert p + 1 <= SIGNATURE_WORD_BITS and len(signs) <= SIGNATURE_WORD_BITS
    hp = hyperplane_bucket_auto(F.col(vec_col), signs, n_rows)
    df = ensure_scan_parallelism(df, n_rows)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        hp.alias("hp"),
        fractional_key(hp, p, r).alias("hpk"),
    )
    bucketed = _cache_signatures(bucketed)
    hot = (
        bucketed.groupBy("hpk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > max_bucket)
        .select("hpk")
    )
    bucketed = bucketed.join(F.broadcast(hot), on="hpk", how="left_anti")
    prefix = F.col("hp").bitwiseAND(F.lit((1 << p) - 1).cast("bigint"))
    ext = F.shiftright(F.col("hp"), p).bitwiseAND(F.lit(1).cast("bigint"))
    keyed = lambda pref, e: fractional_key_parts(pref, e, r)  # noqa: E731

    # candidate generation carries BARE IDS: a pair can meet through
    # several probes, so dedup before the vectors attach — otherwise
    # every duplicate candidate drags two 64-dim arrays through the
    # distinct's exchange
    unmerged = (prefix % 4) < F.lit(r)

    def flip_probe(i: int) -> Column:
        # canonical-direction probing (see the docstring's meeting
        # rule): UP flips always, DOWN flips only into a MERGED
        # target from an UNMERGED prefix — statically impossible for
        # planes >= 2 (the flip does not change prefix % 4, so the
        # target's merged status equals the prober's)
        target = prefix.bitwiseXOR(F.lit(1 << i).cast("bigint"))
        up = F.shiftright(prefix, i).bitwiseAND(F.lit(1).cast("bigint")) == 0
        cond = up
        if i < 2 and r > 0:
            cond = cond | (unmerged & ((target % 4) >= F.lit(r)))
        return F.when(cond, keyed(target, ext))

    probes = bucketed.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.col("hpk"),
                # ext flip: only unmerged rows have a distinct ext
                # bucket (merged keys zero the ext term — probing it
                # would re-enumerate the whole exact bucket, the
                # Σdepth² term), and one direction suffices for the
                # symmetric d = 0 rule
                F.when(
                    unmerged & (ext == F.lit(0).cast("bigint")),
                    keyed(prefix, F.lit(1).cast("bigint")),
                ),
                *[flip_probe(i) for i in range(p)],
            )
        ).alias("probe"),
    ).where(F.col("probe").isNotNull())
    exact = bucketed.select(
        F.col(id_col).alias("item_id"), F.col("hpk").alias("probe")
    )
    # A pair may meet in only ONE direction (a merged prefix's exact
    # key is reachable from its unmerged neighbor's probe, but not
    # vice versa when the extension bits differ), so canonicalize
    # with least/greatest rather than filtering probe_id < exact_id —
    # the directional filter would drop the one meeting path. (A
    # two-branch split that `<`-filters the equal-key component and
    # least/greatests only the flip meetings was measured at all
    # three SFs: no win — the distinct is not the binding stage — so
    # the simpler single join stays.)
    cand = (
        probes.join(exact, on="probe")
        .where(F.col(id_col) != F.col("item_id"))
        .select(
            F.least(F.col(id_col), F.col("item_id")).alias("a_id"),
            F.greatest(F.col(id_col), F.col("item_id")).alias("b_id"),
        )
        .distinct()
    )
    return _verify_pairs(cand, df, id_col, vec_col, threshold)


def near_dup_pairs_multiprobe_bounded(
    df: DataFrame,
    signs,
    prefix_planes: int,
    split_r: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int = 4096,
    n_probes: int = 8,
    n_rows: int | None = None,
) -> DataFrame:
    """Bounded-fan-out multiprobe (Lv et al. 2007, "Multi-Probe
    LSH") — the TRULY-LINEAR member of the probe family: instead of
    flipping every prefix plane (fan-out p+2, which grows with
    log n and leaves an n·log n explode even after the work-target
    normalization — the 11.1×/decade residual in SCALING.md §7d),
    each row probes only its ``n_probes`` LOWEST-|dot| prefix planes
    — the flips a borderline neighbor is most likely to differ in —
    plus the exact key and the extension flip. Work per row =
    (n_probes+2)·depth with BOTH factors constant (depth from the
    depth-constant fractional split), so total work is linear in the
    corpus at every scale.

    The pair rule in signature terms: with x = xor(prefix_a,
    prefix_b), a pair is a candidate iff x = 0 (the extension flip
    covers unmerged ext mismatches), or bit_count(x) = 1 AND the
    differing plane is in EITHER side's probe mask AND the
    fractional-key meet condition holds (merged_a OR merged_b OR
    ext_a = ext_b) — the :func:`near_dup_pairs_multiprobe` rule
    restricted to masked planes; when n_probes ≥ prefix_planes the
    two operators are identical (the gate-SF regime, unit-pinned).
    Recall: a d=1 pair is missed only when the differing plane is
    outside BOTH rows' nearest-``n_probes`` sets — by construction
    the least-likely-to-flip planes.

    One Arrow kernel emits (signature, probe mask) per row
    (:func:`hyperplane_bucket_probe_arrow`); candidate generation is
    the same explode → equi join → bare-id distinct shape, with the
    probe array filtered by the mask JVM-side, and the same
    hot-bucket census cap and rounded-cosine verify tail."""
    p, r = prefix_planes, split_r
    assert p + 1 <= SIGNATURE_WORD_BITS and len(signs) <= SIGNATURE_WORD_BITS
    sp = hyperplane_bucket_probe_arrow(F.col(vec_col), signs, p, n_probes)
    df = ensure_scan_parallelism(df, n_rows)
    bucketed = df.select(
        F.col(id_col), F.col(vec_col), sp.alias("_sp")
    ).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("_sp.hp").alias("hp"),
        F.col("_sp.probe_mask").alias("pm"),
        fractional_key(F.col("_sp.hp"), p, r).alias("hpk"),
    )
    bucketed = _cache_signatures(bucketed)
    hot = (
        bucketed.groupBy("hpk")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > max_bucket)
        .select("hpk")
    )
    bucketed = bucketed.join(F.broadcast(hot), on="hpk", how="left_anti")
    prefix = F.col("hp").bitwiseAND(F.lit((1 << p) - 1).cast("bigint"))
    ext = F.shiftright(F.col("hp"), p).bitwiseAND(F.lit(1).cast("bigint"))
    keyed = lambda pref, e: fractional_key_parts(pref, e, r)  # noqa: E731
    # exact key + extension flip always probe; prefix flip i only
    # when bit i of the row's mask is set — filtered JVM-side before
    # the explode so fan-out is n_probes+2, not p+2
    probe_arr = F.array(
        F.struct(F.col("hpk").alias("k"), F.lit(True).alias("keep")),
        # ext flip only for UNMERGED prefixes: a merged row's flip
        # keys identically to its exact probe (fractional_key_parts
        # zeroes the ext term), which would re-enumerate the whole
        # exact bucket — the Σdepth² candidate-join term — twice
        # per direction (see near_dup_pairs_multiprobe; guide §2.3)
        F.struct(
            keyed(prefix, F.lit(1).cast("bigint") - ext).alias("k"),
            ((prefix % 4) < F.lit(r)).alias("keep"),
        ),
        *[
            F.struct(
                keyed(
                    prefix.bitwiseXOR(F.lit(1 << i).cast("bigint")), ext
                ).alias("k"),
                (
                    F.shiftright(F.col("pm"), i).bitwiseAND(F.lit(1)) == 1
                ).alias("keep"),
            )
            for i in range(p)
        ],
    )
    probes = bucketed.select(
        F.col(id_col),
        F.explode(F.filter(probe_arr, lambda s: s["keep"])).alias("pr"),
    ).select(F.col(id_col), F.col("pr.k").alias("probe"))
    exact = bucketed.select(
        F.col(id_col).alias("item_id"), F.col("hpk").alias("probe")
    )
    cand = (
        probes.join(exact, on="probe")
        .where(F.col(id_col) != F.col("item_id"))
        .select(
            F.least(F.col(id_col), F.col("item_id")).alias("a_id"),
            F.greatest(F.col(id_col), F.col("item_id")).alias("b_id"),
        )
        .distinct()
    )
    return _verify_pairs(cand, df, id_col, vec_col, threshold)


#: Probe fan-out past which the multiprobe family switches to the
#: bounded-T (Lv et al.) rule BY DEFAULT (VERDICT r9 item 1 — the
#: last super-linear decade term). While the fractional prefix width
#: p ≤ this, flipping EVERY prefix plane costs no more than the
#: bounded rule would (fan-out p+2 ≤ T+2) and the two operators emit
#: identical pairs (unit-pinned full-mask equivalence), so the gate
#: changes nothing at small corpora — including both bench gates
#: (p = 6 at 500 vectors, p = 8 at 2 000). Past it, each row probes
#: only its T lowest-|dot| prefix planes: probe rows/input row is
#: (T+2) = 10 at EVERY corpus size, killing the n·log n explode
#: (11.1×/decade measured for the full-prefix rule, SCALING.md §7d).
#: Same policy shape as ARROW_SIGNATURE_MIN_ROWS: a measured
#: crossover constant + one pure function both engines restate.
MULTIPROBE_BOUNDED_FANOUT = 8


def near_dup_pairs_multiprobe_auto(
    df: DataFrame,
    signs,
    prefix_planes: int,
    split_r: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int = 4096,
    n_rows: int | None = None,
) -> DataFrame:
    """Size-gated multiprobe: the full-prefix rule while its fan-out
    is within :data:`MULTIPROBE_BOUNDED_FANOUT` (identical pair set,
    and the expression-form signature kernel stays available for the
    small-corpus fast path), the bounded-T rule past it — constant
    probe volume per row at any scale. The gate is a pure function
    of ``prefix_planes`` (itself a pure function of the corpus
    count), so the DuckDB oracle needs NO branch: the bounded meet
    rule with ``rnk <= T`` masks degenerates to the full symmetric
    rule exactly when p ≤ T (every prefix plane ranks within T)."""
    if prefix_planes <= MULTIPROBE_BOUNDED_FANOUT:
        return near_dup_pairs_multiprobe(
            df,
            signs,
            id_col=id_col,
            vec_col=vec_col,
            threshold=threshold,
            max_bucket=max_bucket,
            prefix_planes=prefix_planes,
            split_r=split_r,
            n_rows=n_rows,
        )
    return near_dup_pairs_multiprobe_bounded(
        df,
        signs,
        prefix_planes=prefix_planes,
        split_r=split_r,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        max_bucket=max_bucket,
        n_probes=MULTIPROBE_BOUNDED_FANOUT,
        n_rows=n_rows,
    )


def near_dup_pairs_banded(
    df: DataFrame,
    signs,
    n_bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    max_bucket: int = 4096,
    widths: list[int] | None = None,
    n_rows: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """Banded (multi-signature) hyperplane LSH — the canonical
    high-recall construction: ONE wide signature of ``len(signs)``
    planes is sliced into ``n_bands`` disjoint bit-bands, and a pair
    is a candidate when ANY band matches exactly. Per-band collision
    s^P (s = 1-θ/π, P = band width) compounds to 1-(1-s^P)^R — the
    recall knob orthogonal to the adaptive width: width buys
    precision (bucket depth), bands buy recall, both at linear cost
    (one explode to R (band, key) rows, equi self-join per band key,
    distinct). Because bands are bit-slices of the SAME signature,
    the plane matrix is computed once and the SQL oracle recovers
    every band key by shifting the one embedded bucket value.

    Hot-bucket guard: (vec, band) rows whose band key's population
    exceeds ``max_bucket`` are dropped (census groupBy + broadcast
    anti join) — the vector keeps its other bands, so recall
    degrades gracefully on adversarial data while per-key pair work
    stays bounded; on non-adversarial data the adaptive width keeps
    E[depth] far below the cap and the guard never binds (oracle
    unaffected at every tested SF).

    ``widths`` (optional) makes the resolution FRACTIONAL: band b is
    the bit-slice [off_b, off_b+widths[b]) of the one signature, with
    widths allowed to differ (the :func:`band_layout` W/W+1 split of
    an :func:`adaptive_total_planes` count). One extra plane then
    moves bucket depth of ONE band by 2× — total candidate work steps
    by ~2^(1/n_bands) instead of 2×, flattening the integral
    sawtooth (SCALING.md §7) while everything downstream (census cap,
    bare-id candidate dedup, verify) is width-agnostic. Default
    (None) keeps the legacy equal split of ``len(signs)``.

    ``offset`` shifts every band slice up by that many planes —
    band b then covers [offset + off_b, offset + off_b + w_b). The
    plane statistics are identical (all planes are i.i.d. md5-parity
    draws), so this changes WHICH independent signature the bands
    read, not the construction; its purpose is pinning the
    multi-word signature path (band keys in word 1 / straddling the
    60-bit boundary) at corpus sizes whose adaptive totals would
    otherwise stay inside word 0 — see sim_lsh_banded_hiword."""
    if widths is None:
        assert offset == 0, "offset requires explicit widths"
        total = len(signs)
        assert total % n_bands == 0, "plane count must divide into bands"
        p_band = total // n_bands
        layout = [(r * p_band, p_band) for r in range(n_bands)]
    else:
        # the matrix may carry extra planes past the banded span
        # (e.g. covering the recall harness's single-signature read).
        # Zero-width bands (adaptive_total_planes < n_bands, i.e.
        # corpus ≤ target·2^((n_bands-1)/n_bands) ≈ 13 rows at the
        # defaults) degenerate to mask 0 = one all-pairs bucket —
        # benign at those sizes, mirrored bit-exactly by the oracle's
        # shifted-slice restatement, and bounded by max_bucket like
        # any other key.
        assert len(widths) == n_bands and offset + sum(widths) <= len(signs)
        layout = []
        off = offset
        for w in widths:
            layout.append((off, w))
            off += w
    # the signature may exceed one bigint word (total planes = the
    # full quarter-step count Q ≤ MAX_QUARTER_STEPS) — carry it as
    # ceil(P/60) words and slice band keys across the word boundary
    df = ensure_scan_parallelism(df, n_rows)
    bucketed = _cache_signatures(
        df.select(
            F.col(id_col),
            F.col(vec_col),
            hyperplane_bucket_words_auto(
                F.col(vec_col), signs, n_rows
            ).alias("hpw"),
        )
    )
    words = [
        F.element_at("hpw", w + 1)
        for w in range(signature_n_words(len(signs)))
    ]
    keyed = bucketed.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("band"),
                        band_key_words(words, off, w).alias("key"),
                    )
                    for r, (off, w) in enumerate(layout)
                ]
            )
        ).alias("bk"),
    ).select(id_col, vec_col, "bk.band", "bk.key")
    hot = (
        keyed.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("_bn"))
        .where(F.col("_bn") > max_bucket)
        .select("band", "key")
    )
    keyed = keyed.join(F.broadcast(hot), on=["band", "key"], how="left_anti")
    # bare-id candidates, distinct BEFORE vectors attach (a pair can
    # match in several bands; see near_dup_pairs_multiprobe)
    other = keyed.select(F.col(id_col).alias("item_id"), "band", "key")
    cand = (
        keyed.select(id_col, "band", "key")
        .join(other, on=["band", "key"])
        .where(F.col(id_col) < F.col("item_id"))
        .select(F.col(id_col).alias("a_id"), F.col("item_id").alias("b_id"))
        .distinct()
    )
    return _verify_pairs(cand, df, id_col, vec_col, threshold)


def near_dup_pairs_blas(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_blocks: int = 8,
    split_bucket: int = 8192,
) -> DataFrame:
    """Vectorized variant of :func:`near_dup_pairs`: BLAS matrix
    products via ``applyInPandas`` instead of per-pair interpreted
    array lambdas (~10× at 64 dims, growing with dimension).

    Oversized-bucket split (the hot-bucket guard, same design as
    ``prefix_filtered_jaccard_pairs``'s ``split_bucket``): a bucket's
    pairwise work is intrinsically quadratic in its population, and
    one-task-per-bucket made the largest bucket a straggler — the
    sf1 sweep measured 16× wall-clock at 10× vectors because each
    label bucket ran as ONE task (SCALING.md §6). Buckets larger
    than ``split_bucket`` rows (a bounded census: groupBy count on
    the bucket key, broadcast back — the corpus itself never
    shuffles for the census) hash their rows into ``n_blocks``
    blocks and replicate each row to the ``n_blocks`` (i ≤ j)
    block-pair groups it participates in, so the bucket's n²
    products spread over n_blocks(n_blocks+1)/2 tasks of
    (n/n_blocks)² each: no task ever holds a whole oversized bucket
    (memory bound = 2n/n_blocks rows), stragglers parallelize, and
    every unordered pair is computed in EXACTLY ONE group — output
    bit-identical to the one-task form (same float64 dot from the
    same inputs). Buckets at or under the cap keep the
    single-group, zero-replication path, so small-corpus plans pay
    only the census. Raw cosines are computed in float64;
    rounding/threshold semantics applied JVM-side so they stay
    identical to the HOF form.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("raw_cos", DoubleType()),
        ]
    )

    def pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(key[-2]), int(key[-1])
        empty = pd.DataFrame(columns=["a_id", "b_id", "raw_cos"])
        if len(pdf) < 2:
            return empty

        def block(sel: pd.DataFrame):
            order = sel[id_col].to_numpy().argsort()
            ids = sel[id_col].to_numpy()[order]
            x = np.stack(sel[vec_col].to_numpy()[order]).astype(np.float64)
            # zero-norm guard: an all-zero embedding must score 0
            # (below any positive threshold), matching the HOF form's
            # NULL-drop — an unguarded 0/0 NaN would PASS the >=
            # filter (NaN sorts high in Spark) and emit spurious pairs
            xn = x / np.maximum(
                np.linalg.norm(x, axis=1, keepdims=True), 1e-300
            )
            return ids, xn

        if gi == gj:
            ids, xn = block(pdf)
            sims = xn @ xn.T
            ai, bi = np.triu_indices(len(ids), k=1)
            return pd.DataFrame(
                {"a_id": ids[ai], "b_id": ids[bi], "raw_cos": sims[ai, bi]}
            )
        a_sel = pdf[pdf["_blk"] == gi]
        b_sel = pdf[pdf["_blk"] == gj]
        if a_sel.empty or b_sel.empty:
            return empty
        a_ids, a_xn = block(a_sel)
        b_ids, b_xn = block(b_sel)
        sims = a_xn @ b_xn.T
        ai, bi = np.indices(sims.shape)
        ai, bi = ai.ravel(), bi.ravel()
        lo = np.minimum(a_ids[ai], b_ids[bi])
        hi = np.maximum(a_ids[ai], b_ids[bi])
        return pd.DataFrame(
            {"a_id": lo, "b_id": hi, "raw_cos": sims[ai, bi]}
        )

    base = df.select(F.col(bucket_col), F.col(id_col), F.col(vec_col))
    census = base.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("_bn"))
    big = F.col("_bn") > F.lit(split_bucket)
    blk = F.when(
        big, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    ).otherwise(F.lit(0))
    ks = F.when(big, F.sequence(F.lit(0), F.lit(n_blocks - 1))).otherwise(
        F.array(F.lit(0))
    )
    rep = (
        base.join(F.broadcast(census), bucket_col)
        .withColumn("_blk", blk)
        .withColumn("_k", F.explode(ks))
        .select(
            bucket_col,
            id_col,
            vec_col,
            "_blk",
            F.least("_blk", "_k").alias("_gi"),
            F.greatest("_blk", "_k").alias("_gj"),
        )
    )
    scored = rep.groupBy(bucket_col, "_gi", "_gj").applyInPandas(
        pairs, schema=out_schema
    )
    rounded = F.round(F.col("raw_cos") + F.lit(1e-9), 6)
    return (
        scored.select("a_id", "b_id", rounded.alias("cos_sim"))
        .where(F.col("cos_sim") >= F.lit(threshold))
    )


# ---------------------------------------------------------------------------
# IVF: real centroid training + assignment (the 100 TB ANN path).
# Training is driver-side numpy over a BOUNDED sample (the classic IVF
# recipe — centroid count and sample size are independent of corpus
# size); assignment and search are distributed.
# ---------------------------------------------------------------------------


def kmeans_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 10,
    sample_limit: int = 10_000,
    seed: int = 42,
):
    """Spherical k-means on a bounded sample, driver-side.

    Returns a unit-normalized (k, d) numpy array. The sample cap (not
    a fraction) keeps driver memory constant at any corpus size;
    deterministic under the seed.
    """
    # Narrow deterministic sample: hash-filter then limit — no global
    # sort/shuffle of the corpus, constant driver memory.
    sample = (
        df.select(F.col(vec_col).cast("array<double>").alias("v"))
        .where(F.pmod(F.xxhash64(F.col("v"), F.lit(seed)), F.lit(4)) == 0)
        .limit(sample_limit)
        .collect()
    )
    if len(sample) < k:
        # small corpus: the ~1/4 hash filter can starve (or empty) the
        # sample — fall back to an unfiltered limit so training never
        # crashes on a corpus that brute force would handle anyway
        sample = (
            df.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(sample_limit)
            .collect()
        )
    if not sample:
        raise ValueError("kmeans_centroids: empty corpus — nothing to train on")
    x = np.array([r[0] for r in sample], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def assign_ivf_buckets(
    df: DataFrame,
    centroids,
    vec_col: str = "embedding",
    nprobe: int = 1,
    out_col: str = "ivf_bucket",
) -> DataFrame:
    """Attach the top-``nprobe`` centroid ids per row (vectorized
    argpartition over the broadcast (k, d) centroid matrix; one output
    row per probe via explode). nprobe=1 for corpus indexing, >1 for
    query-side multi-probe recall."""
    from pyspark.sql.types import ArrayType, IntegerType

    cents = centroids.astype("float64")

    @F.pandas_udf(ArrayType(IntegerType()))
    def probes(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cents.T
        if nprobe >= sims.shape[1]:
            top = np.argsort(-sims, axis=1)
        else:
            part = np.argpartition(-sims, nprobe, axis=1)[:, :nprobe]
            order = np.take_along_axis(sims, part, axis=1).argsort(axis=1)[:, ::-1]
            top = np.take_along_axis(part, order, axis=1)
        return pd.Series([row[:nprobe].tolist() for row in top])

    return df.withColumn(out_col, F.explode(probes(F.col(vec_col))))


def ivf_cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN search: corpus indexed once (nprobe=1), queries probe
    their ``nprobe`` nearest cells, scoring is bucket-local (equi join
    on the cell id — never a cross join). Recall improves with nprobe
    at linear probe cost; results become exact (= cosine_topk) only
    when nprobe reaches the centroid count — nprobe is unrelated to
    k."""
    c = assign_ivf_buckets(corpus, centroids, vec_col, nprobe=1)
    q = assign_ivf_buckets(queries, centroids, vec_col, nprobe=nprobe)
    scored = _scored(q, c, id_col, vec_col, on=["ivf_bucket"])
    # A (query, item) pair can meet in several probed cells → dedup
    # before ranking.
    scored = scored.groupBy("query_id", "item_id").agg(F.max("cos_sim").alias("cos_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "item_id", "cos_sim")
    )


def cosine_topk_blas(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    max_index_rows: int = 2_000_000,
) -> DataFrame:
    """Broadcast-corpus brute-force top-k: the physical shape
    exhaustive scoring should take when the corpus index fits in
    executor memory — replicate the (ids, matrix, norms) triple once
    per worker via a broadcast variable, then stream query batches
    through ONE BLAS matmul each. No crossJoin row explosion, no
    shuffle, no per-pair interpreted lambdas; wall-clock scales as
    queries × corpus FLOPs at memory bandwidth. Value-identical to
    :func:`cosine_topk` (same +1e-9/round-6 policy applied BEFORE
    ranking, same (cos desc, item_id) tie-break) — the registry
    checks both against one oracle. Corpus larger than worker memory
    → shard the corpus and merge per-shard top-k, or switch to
    :func:`ivf_cosine_topk`.

    The corpus materializes at the DRIVER before broadcast, so the
    index size is a hard contract, not a hope: a cheap count() guard
    (``max_index_rows``, default 2M ≈ a few GB at typical embedding
    widths) turns an oversized corpus into an immediate, actionable
    error instead of a driver OOM minutes into the collect.
    """
    n_index = corpus.count()
    if n_index > max_index_rows:
        raise ValueError(
            f"cosine_topk_blas: corpus has {n_index} rows, over the "
            f"broadcast-index budget of {max_index_rows}. This operator "
            "replicates the whole index to every worker — shard the "
            "corpus and merge per-shard top-k, or use ivf_cosine_topk "
            "(bucketed ANN), which scales past worker memory."
        )
    rows = corpus.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    mat = np.stack(
        [np.asarray(rows[int(i)][1], dtype=np.float64) for i in order]
    )
    norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-300)
    bc = queries.sparkSession.sparkContext.broadcast((ids, mat, norms))

    def score(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float64)
            qn = np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-300)
            raw = (q @ b_mat.T) / (qn * b_norms)
            # rank on a HALF-AWAY-FROM-ZERO 6-decimal round (np.round
            # is half-to-even — it can diverge from Spark/DuckDB round
            # on exact .5 ties); the emitted value stays raw and is
            # rounded JVM-side below, exactly as near_dup_pairs_blas
            # does, so both engines share one rounding implementation
            shifted = raw + 1e-9
            rank_key = np.copysign(np.floor(np.abs(shifted) * 1e6 + 0.5) / 1e6, shifted)
            out = []
            for qi, qid in enumerate(pdf[id_col].to_numpy()):
                keep = b_ids != qid  # exclude self
                cand_ids = b_ids[keep]
                cand_key, cand_raw = rank_key[qi][keep], raw[qi][keep]
                top = np.lexsort((cand_ids, -cand_key))[:k]
                for rank, j in enumerate(top, start=1):
                    out.append((int(qid), rank, int(cand_ids[j]), float(cand_raw[j])))
            yield pd.DataFrame(out, columns=["query_id", "rank", "item_id", "cos_sim"])

    scored = queries.select(id_col, vec_col).mapInPandas(
        score, "query_id long, rank int, item_id long, cos_sim double"
    )
    return scored.withColumn("cos_sim", F.round(F.col("cos_sim") + F.lit(1e-9), 6))


def semantic_dedup(
    df: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embedding space, then drop near-duplicates
    cluster-locally.

    Within each k-means cluster, every pair with rounded cosine >=
    ``threshold`` marks one member for removal: the one MORE similar
    to its centroid (ties -> larger id) — the paper's
    keep-the-outlier rule, which preserves diversity, made
    deterministic. Non-iterative by construction (a single drop pass,
    not a greedy sequence), so the result is order-independent and
    reproducible across partitionings.

    Scale shape: centroid assignment is one Arrow-batched matmul
    against the broadcast (k, d) matrix (no shuffle); the pair scan
    is CLUSTER-local (the near_dup_pairs bucket join — candidate
    space is sum of squared cluster sizes, never corpus²); the drop
    set is one distinct + one anti-join. All keys are ints.

    Returns (id, cluster, centroid_sim, kept) for every input row.
    """
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(
        StructType(
            [
                StructField("cluster", IntegerType()),
                StructField("centroid_sim", DoubleType()),
            ]
        )
    )
    def assign(vecs: pd.Series) -> pd.DataFrame:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sims = x @ cents.T
        best = sims.argmax(axis=1)
        return pd.DataFrame(
            {
                "cluster": best.astype("int32"),
                "centroid_sim": sims[np.arange(len(best)), best],
            }
        )

    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        assign(F.col(vec_col)).alias("_a"),
    ).select(
        id_col,
        vec_col,
        F.col("_a.cluster").alias("cluster"),
        F.round(F.col("_a.centroid_sim") + F.lit(1e-9), 6).alias("centroid_sim"),
    )
    pairs = near_dup_pairs(
        assigned, "cluster", id_col=id_col, vec_col=vec_col, threshold=threshold
    )
    sims = assigned.select(F.col(id_col).alias("_id"), F.col("centroid_sim").alias("_cs"))
    # For each near-dup pair, drop the member closer to the centroid
    # (tie -> larger id): one broadcast-sized decision join per side.
    drops = (
        pairs.join(sims.withColumnRenamed("_id", "a_id").withColumnRenamed("_cs", "a_cs"), "a_id")
        .join(sims.withColumnRenamed("_id", "b_id").withColumnRenamed("_cs", "b_cs"), "b_id")
        .select(
            F.when(
                (F.col("a_cs") > F.col("b_cs"))
                | ((F.col("a_cs") == F.col("b_cs")) & (F.col("a_id") > F.col("b_id"))),
                F.col("a_id"),
            )
            .otherwise(F.col("b_id"))
            .alias("_drop")
        )
        .distinct()
    )
    return assigned.join(
        drops, assigned[id_col] == drops["_drop"], "left"
    ).select(
        id_col,
        "cluster",
        "centroid_sim",
        F.col("_drop").isNull().alias("kept"),
    )


def quantize_embeddings_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar (per-dimension min/max) int8 quantization of an
    embedding column — the storage/bandwidth compression every
    production ANN index applies before sharding (4x smaller than
    float32, 8x smaller than the float64 shuffle representation).

    Two passes, both scale-safe:

    1. Per-dimension corpus min/max via posexplode + groupBy(dim).
       d keys only, and min/max partial-aggregate map-side, so the
       exchange carries d rows per partition — never the corpus.
    2. The d-row stats table is collapsed to one array row and
       broadcast-joined back (BroadcastNestedLoopJoin of a 1-row
       build side — constant cost); codes are computed JVM-side with
       ``transform`` + ``element_at``: code = round(255*(x-lo)/span),
       span clamped so constant dimensions quantize to 0.

    Emits per-vector codes plus the mean absolute reconstruction
    error — the quality metric a quantized index is accepted on.
    """
    v = F.col(vec_col).cast("array<double>")
    dims = df.select(F.posexplode(v).alias("i", "x"))
    stats = dims.groupBy("i").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    minmax = stats.groupBy().agg(
        F.array_sort(
            F.collect_list(F.struct("i", "lo", "hi"))
        ).alias("_s")
    ).select(
        F.transform("_s", lambda s: s["lo"]).alias("_lo"),
        F.transform("_s", lambda s: F.greatest(s["hi"] - s["lo"], F.lit(1e-12))).alias(
            "_span"
        ),
    )
    coded = df.select(F.col(id_col), v.alias("_v")).crossJoin(F.broadcast(minmax))
    code = lambda x, i: F.round(
        (x - F.element_at("_lo", i + 1)) / F.element_at("_span", i + 1) * 255
        + F.lit(1e-9)
    ).cast("int")
    recon = lambda c, i: F.element_at("_lo", i + 1) + c / F.lit(255.0) * F.element_at(
        "_span", i + 1
    )
    codes = F.transform("_v", code)
    err = F.aggregate(
        F.zip_with(F.transform(codes, recon), "_v", lambda r, x: F.abs(r - x)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    ) / F.size("_v")
    return coded.select(
        id_col,
        F.array_join(codes.cast("array<string>"), ",").alias("codes"),
        F.round(err + F.lit(1e-9), 6).alias("mean_abs_err"),
    )


# --- product quantization (PQ) ----------------------------------------------



def pq_codebook_rows(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
) -> list[tuple[int, list[tuple[int, list[float]]]]]:
    """Deterministic PQ codebook, materialized at the DRIVER: the
    ``n_codes`` seed vectors (corpus rows ranked by ``md5(id)`` — a
    uniform, engine-portable pseudo-random draw; sample-initialized
    codebooks are the standard PQ baseline) are collected with ONE
    bounded TakeOrdered job (n_codes rows — same driver contract as
    the k-means sample cap) and sliced locally.

    Returns ``[(sub, [(code, cent), ...]), ...]`` — the whole
    codebook is ``n_sub × n_codes`` subvectors (128 here). Collecting
    it once is what keeps the ADC search a single corpus scan: built
    lazily, every broadcast of the codebook (assignment join, lookup
    table) re-ran the corpus TakeOrdered subplan.
    """
    d_sub = dim // n_sub
    h = F.md5(F.col(id_col).cast("string"))
    rows = (
        embeddings.orderBy(h, F.col(id_col))
        .limit(n_codes)
        .select(h.alias("_h"), F.col(id_col), to_double_array(F.col(vec_col)).alias("v"))
        .collect()
    )
    rows.sort(key=lambda r: (r[0], r[1]))  # (md5, id) — row_number order
    return [
        (
            s,
            [
                (code, list(r[2][s * d_sub : (s + 1) * d_sub]))
                for code, r in enumerate(rows)
            ],
        )
        for s in range(n_sub)
    ]



def _d(x: float) -> str:
    """Shortest-repr double SQL literal — round-trips to the exact
    same IEEE double when Spark's parser reads it back."""
    return repr(float(x)) + "D"


def _pq_best_sql(v_sql: str, sub: int, cands, d_sub: int) -> str:
    """SQL for the (dist, code) struct of the nearest centroid in
    subspace ``sub``: ``array_min`` over ``transform`` of the literal
    candidate array, distance via ``zip_with``+``aggregate`` — the
    same left-associated IEEE chain and (rounded dist, code)
    tie-break as the joined form this replaces.

    Emitted as ONE SQL string (parsed JVM-side in a single call)
    because building the equivalent unrolled Column tree in Python
    costs ~10 s of py4j round trips per query and overflows codegen
    into slow interpreted eval; the HOF form stays compact and its
    lambdas touch only attributes and the constant-folded candidate
    literal. The raw float element is cast to double per element
    (exact) — no whole-array cast that CollapseProject would inline
    into every reference."""
    items = ", ".join(
        f"named_struct('code', {code}, 'cent', "
        f"array({', '.join(_d(x) for x in cent)}))"
        for code, cent in cands
    )
    sv = f"slice({v_sql}, {sub * d_sub + 1}, {d_sub})"
    return (
        f"array_min(transform(array({items}), c -> named_struct("
        f"'dist', round(aggregate(zip_with({sv}, c.cent, "
        f"(a, b) -> (cast(a AS double) - b) * (cast(a AS double) - b)), "
        f"0.0D, (acc, x) -> acc + x) + 1e-9, 6), "
        f"'code', c.code)))"
    )


def pq_codes(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
    codebook_rows: list | None = None,
) -> DataFrame:
    """Product-quantization encoding: each vector compresses to
    ``n_sub`` one-byte codes — the nearest codebook centroid per
    subspace (squared-L2, ties to the lowest code). 64 float32 dims
    → 8 bytes: a 32× memory cut that lets a 100 TB embedding corpus
    sit in RAM-resident ANN indexes.

    Shape: the driver-literal codebook is folded INTO the projection
    (constant-folded candidate arrays — see :func:`_pq_best_sql`), so
    each row computes its 8 (code, dist) structs in one pass and
    ``posexplode`` emits them: ONE corpus scan, zero joins, zero
    exchanges, zero Python. (The previous
    posexplode→broadcast-join→array_min form produced identical
    values but shipped every sub-row through a join.)
    Returns (id, sub, code, dist) with dist rounded at 6 decimals
    (the argmin key, cross-engine stable). Pass ``codebook_rows`` to
    share one collected codebook across encode and search stages.
    """
    d_sub = dim // n_sub
    rows = (
        codebook_rows
        if codebook_rows is not None
        else pq_codebook_rows(embeddings, id_col, vec_col, dim, n_sub, n_codes)
    )
    per_sub = F.expr(
        "array("
        + ", ".join(_pq_best_sql(f"`{vec_col}`", s, cands, d_sub) for s, cands in rows)
        + ")"
    )
    return embeddings.select(
        F.col(id_col), F.posexplode(per_sub).alias("sub", "_b")
    ).select(
        F.col(id_col),
        "sub",
        F.col("_b.code").alias("code"),
        F.col("_b.dist").alias("dist"),
    )


def _pq_l2_chain_py(a: list[float], b: list[float]) -> float:
    """Driver-side twin of the SQL chain emitted by
    :func:`_pq_best_sql`: the same
    left-associated (x−y)·(x−y) addition chain over IEEE doubles —
    python floats ARE doubles, so the result is bit-identical to the
    JVM/DuckDB evaluation of the same chain."""
    total = 0.0
    for x, y in zip(a, b):
        total += (x - y) * (x - y)
    return total



def pq_adc_topk(
    embeddings: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Asymmetric-distance (ADC) search over PQ codes: the query (the
    code-0 seed vector) precomputes its distance to every codebook
    centroid — an ``n_sub × n_codes`` lookup table (128 rows) — and a
    corpus vector's distance estimate is the sum of 8 table lookups,
    never a touch of the raw floats. This is the PQ search path: at
    100 TB the scan reads 8-byte codes + a broadcast table instead of
    256-byte vectors.

    The per-vector sum adds the 8 looked-up distances in a fixed
    chain (not a groupBy-sum whose float order is nondeterministic),
    keeping the top-k selection engine-portable. Returns the ``k``
    nearest (id, adc_dist).

    The codebook is collected ONCE (n_codes rows); both the per-sub
    code argmin and the LUT lookup are folded into ONE narrow
    projection as literals (``element_at`` on a 16-double literal
    array indexed by the in-row code), so the whole search plans as
    scan → project → TakeOrdered: zero joins, zero shuffles. The LUT
    is computed at the driver with the identical left-associated IEEE
    chain :func:`_pq_best_sql` emits in-plan (via its driver twin
    :func:`_pq_l2_chain_py`) — bit-equal doubles, so the oracle
    identity is unchanged.
    """
    d_sub = dim // n_sub
    cb_rows = pq_codebook_rows(embeddings, id_col, vec_col, dim, n_sub, n_codes)
    return (
        embeddings.select(
            F.col(id_col), _adc_dist_inrow(cb_rows, d_sub, vec_col)
        )
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def _adc_dist_inrow(cb_rows, d_sub: int, vec_col: str) -> Column:
    """The ADC distance of the raw vector column as one in-row
    expression: per subspace, argmin code against the literal
    codebook (:func:`_pq_best_sql`), then a literal-array LUT lookup
    of the query→centroid distance; the 8 lookups summed in a fixed
    left-associated chain and rounded like the joined/pivoted form
    this replaces. One ``F.expr`` parse — see :func:`_pq_best_sql`
    for why the SQL-string form."""
    terms = []
    for s, cands in cb_rows:
        qcent = cands[0][1]  # code 0 = the query seed subvector
        lut = "array(" + ", ".join(
            _d(_pq_l2_chain_py(qcent, cent)) for _code, cent in cands
        ) + ")"
        best = _pq_best_sql(f"`{vec_col}`", s, cands, d_sub)
        terms.append(f"element_at({lut}, {best}.code + 1)")
    return F.expr(f"round({' + '.join(terms)} + 1e-9, 6)").alias("adc_dist")


def ivfpq_adc_topk(
    embeddings: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """IVF-PQ: the production ANN composition — a coarse k-means cell
    per vector (IVF) restricts the scan, and within probed cells
    distances come from 8-byte PQ codes via the broadcast ADC lookup
    table, never the raw floats. At 100 TB the index is cell-
    partitioned code rows: a probe touches nprobe/n_cells of the
    bytes and each touched row is 32× smaller than its vector.

    ``nprobe=None`` probes every cell, which makes the result
    provably identical to exhaustive ADC (``pq_adc_topk``) — the
    oracle identity, same pattern as ``sink_ivf_index`` proving the
    IVF round-trip against brute force. A partial probe trades that
    guarantee for scan fraction, monotonically: fewer cells can only
    remove candidates, never reorder survivors (asserted in tests).

    Codebook and ADC table are collected/computed once at the driver
    (see :func:`pq_adc_topk`); the cell id comes from the same
    Arrow-batched assignment pass the IVF index build uses, attached
    IN the scan row — so the whole search is scan → assign (narrow
    Arrow) → project → optional broadcast probe-filter →
    TakeOrdered, with no corpus self-join and no pivot shuffle.
    """
    d_sub = dim // n_sub
    cents = kmeans_centroids(
        embeddings, k=n_cells, iters=5, seed=42, vec_col=vec_col
    )
    bucketed = assign_ivf_buckets(embeddings, cents, vec_col=vec_col, nprobe=1)
    cb_rows = pq_codebook_rows(embeddings, id_col, vec_col, dim, n_sub, n_codes)
    if nprobe is not None:
        # probe the nprobe cells nearest the QUERY (the code-0 seed)
        h = F.md5(F.col(id_col).cast("string"))
        seed1 = embeddings.orderBy(h, F.col(id_col)).limit(1)
        probe_cells = (
            assign_ivf_buckets(seed1, cents, vec_col=vec_col, nprobe=nprobe)
            .select("ivf_bucket")
            .distinct()
        )
        bucketed = bucketed.join(F.broadcast(probe_cells), on="ivf_bucket")
    return (
        bucketed.select(
            F.col(id_col), _adc_dist_inrow(cb_rows, d_sub, vec_col)
        )
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def pq_codes_wide(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 8,
    n_codes: int = 16,
    codebook_rows: list | None = None,
    keep_cols: tuple = (),
) -> DataFrame:
    """PQ encode in the WIDE storage layout — one ``code_{s}`` int
    column per subspace instead of exploded (sub, code) rows. This is
    what a persisted PQ index actually stores (8 bytes per vector, no
    row-count blowup) and what lets ADC search over STORED codes stay
    a narrow projection. Same in-row literal-codebook argmin as
    :func:`pq_codes` (shared ``_pq_best_sql``), zero joins/exchanges.
    """
    d_sub = dim // n_sub
    rows = (
        codebook_rows
        if codebook_rows is not None
        else pq_codebook_rows(embeddings, id_col, vec_col, dim, n_sub, n_codes)
    )
    return embeddings.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        *[
            F.expr(f"{_pq_best_sql(f'`{vec_col}`', s, cands, d_sub)}.code").alias(
                f"code_{s}"
            )
            for s, cands in rows
        ],
    )


def adc_from_stored_codes(cb_rows) -> Column:
    """ADC distance recomputed from STORED wide PQ codes (``code_{s}``
    columns) — the search-over-persisted-index path: 8 literal-array
    lookups summed in the same fixed chain (and rounding) as
    :func:`_adc_dist_inrow`, so full-probe search over the stored
    index is bit-identical to in-memory exhaustive ADC."""
    terms = []
    for s, cands in cb_rows:
        qcent = cands[0][1]
        lut = "array(" + ", ".join(
            _d(_pq_l2_chain_py(qcent, cent)) for _code, cent in cands
        ) + ")"
        terms.append(f"element_at({lut}, code_{s} + 1)")
    return F.expr(f"round({' + '.join(terms)} + 1e-9, 6)").alias("adc_dist")
