"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the correctness baseline, plus a
partition-pruned (IVF-style) variant as the scale path: with a coarse
bucket assignment column, the search join only touches same-bucket
rows — at 100 TB that's the difference between an O(n·q) cross join
and bucket-local probes. All vector math is JVM higher-order
functions (zip_with/aggregate) — no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from weather4cast_bigdata_spark.functions.arrays import cosine, to_double_array


def _scored(queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, on=None) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias("query_id"),
        to_double_array(F.col(vec_col)).alias("qv"),
        *([F.col(c) for c in on] if on else []),
    )
    c = corpus.select(
        F.col(id_col).alias("item_id"),
        to_double_array(F.col(vec_col)).alias("cv"),
        *([F.col(c_) for c_ in on] if on else []),
    )
    joined = q.join(c, on=list(on), how="inner") if on else q.crossJoin(c)
    # +1e-9 tie-break epsilon before rounding (see plans.registry
    # numeric policy): summation order differs across engines.
    return joined.where(F.col("query_id") != F.col("item_id")).select(
        "query_id",
        "item_id",
        F.round(cosine(F.col("qv"), F.col("cv")) + F.lit(1e-9), 6).alias("cos_sim"),
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


def near_dup_pairs_blas(
    df: DataFrame,
    bucket_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Vectorized variant of :func:`near_dup_pairs`: one BLAS matrix
    product per bucket via ``applyInPandas`` instead of per-pair
    interpreted array lambdas (~10× at 64 dims, growing with
    dimension). Each bucket must fit one worker — that is the IVF
    contract (bucket granularity is the knob). Raw cosines are
    computed in float64; rounding/threshold semantics applied
    JVM-side so they stay identical to the HOF form.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("raw_cos", DoubleType()),
        ]
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["a_id", "b_id", "raw_cos"])
        order = pdf[id_col].to_numpy().argsort()
        ids = pdf[id_col].to_numpy()[order]
        x = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        sims = xn @ xn.T
        ai, bi = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"a_id": ids[ai], "b_id": ids[bi], "raw_cos": sims[ai, bi]}
        )

    scored = df.select(F.col(bucket_col), F.col(id_col), F.col(vec_col)).groupBy(
        bucket_col
    ).applyInPandas(pairs, schema=out_schema)
    rounded = F.round(F.col("raw_cos") + F.lit(1e-9), 6)
    return (
        scored.select("a_id", "b_id", rounded.alias("cos_sim"))
        .where(F.col("cos_sim") >= F.lit(threshold))
    )
