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
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    return (
        docs.select(F.col(id_col), F.explode(word_shingles(tokens(F.col(text_col)), n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingled: DataFrame, id_col: str = "doc_id", n_hashes: int = 4
) -> DataFrame:
    """MinHash signature per doc: for each permutation i, the min over
    shingles of ``(aᵢ·h32(shingle) + bᵢ) mod P``.

    One groupBy(id) with n_hashes min-aggregates — map-side combine
    keeps shuffle volume at n_hashes·8 bytes per doc regardless of
    document length.
    """
    h = md5_hash32(F.col("shingle"))
    aggs = []
    for i, (a, b) in enumerate(MINHASH_PERMS[:n_hashes]):
        aggs.append(
            F.min((h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"mh_{i}")
        )
    return shingled.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", n_hashes: int = 4, band_size: int = 2
) -> DataFrame:
    """LSH banding: docs sharing any full band of the signature become
    a candidate pair (id_a < id_b, deduplicated).

    Band self-join is bucket-local: shuffle on (band_idx, band_hash)
    then pairs form only inside buckets — linear in bucket sizes.
    """
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh_{i}").cast("string") for i in range(b * band_size, (b + 1) * band_size)]
        bands.append(
            signatures.select(
                F.col(id_col),
                F.lit(b).alias("band_idx"),
                F.concat_ws("_", *cols).alias("band_key"),
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionAll(extra)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            on=(
                (F.col("l.band_idx") == F.col("r.band_idx"))
                & (F.col("l.band_key") == F.col("r.band_key"))
                & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            ),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
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

    Pair formation is shingle-bucket-local (shuffle on shingle), so
    cost tracks shared-shingle volume, not n².
    """
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    l = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    r = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        l.join(r, on="shingle")
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


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 16) -> DataFrame:
    """SimHash fingerprint: per bit b, sign of Σ_tokens (±1 by bit b of
    h32(token)); composed into a ``bits``-wide integer.

    Token explode + single groupBy(id) with ``bits`` conditional sums.
    """
    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    h = md5_hash32(F.col("tok"))
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


__all__ = [
    "exact_duplicates",
    "doc_shingles",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "MINHASH_PERMS",
    "MINHASH_PRIME",
    "md5_hash64",
]
