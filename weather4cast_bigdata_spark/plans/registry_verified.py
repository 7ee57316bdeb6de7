"""Hash-verified sibling queries for the rows-only operator families
(round-3, VERDICT.md item 6/8).

Several SURVEY.md §2 operators are inherently rows-only at the driver
gate — binary decode over a fixture lake the oracle cannot see, RNG
permutations whose order IS the semantics, sketch estimates, and
iterative fixed points. Each entry here re-expresses the *same
engine code path* over the driver's star-schema tables in a form
DuckDB can replay exactly, upgrading the family from "rows-only
evidence + local invariant tests" to a hash-matched driver row:

- ``shuffle_seeded_verified``   — the epoch-shuffle permutation with a
  cross-engine md5 ranking key (rows-only twin: ``shuffle_seeded``).
- ``graph_pagerank_verified``   — the production ``pagerank()`` loop on
  a mod-97 projection of the event graph, oracle = the same damped
  power iteration unrolled as chained CTEs (twin: ``graph_pagerank``).
- ``agg_approx_distinct_verified`` — HLL++ estimate bound-checked
  in-plan against the exact count (twin: ``agg_approx_distinct``).
- ``solve_ridge_sum1_verified`` — the Σw=1 bordered solver vs the SQL
  closed form (twin: ``solve_ridge_sum1``; cf ``solve_ridge_verified``).
- ``scan_binary_roundtrip_verified`` / ``udf_scatter_roundtrip_verified``
  — the np.frombuffer decode kernel and the applyInPandas dense-scatter
  kernel on values the oracle can recompute (twins: ``scan_static_raw``,
  ``udf_vectorized_kernel``, ``cache_decoded``).
- ``quantize_halfeven_parity``  — the numpy round-half-to-EVEN
  quantization quirk (SURVEY.md §2.8) pinned end-to-end on exact
  dyadic .5 ties (twin: ``sink_quantized_partitioned``).
- ``multimodal_plumbing_verified`` — the binary-column mapInPandas
  feature plumbing on blobs built from ``documents.text`` (twins:
  ``multimodal_image_features`` / ``multimodal_audio_features``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from weather4cast_bigdata_spark.functions import scalar
from weather4cast_bigdata_spark.plans.registry import _t, qdef, r6

# =====================================================================
# shuffle_seeded_verified
# =====================================================================


@qdef(
    "shuffle_seeded_verified",
    oracle="""
    SELECT event_id, user_id,
           row_number() OVER (ORDER BY md5('42_' || event_id), event_id) AS pos
    FROM events
    """,
)
def q_shuffle_seeded_verified(spark, sf_dir):
    """The seeded epoch shuffle (datasets.py:245,251-254) made
    hash-verifiable: the permutation key is md5(seed || id) — a
    counter-based draw both engines compute identically — instead of
    engine RNG, so the full permutation (position included) is a
    driver-checkable value. Same semantics class as the rows-only
    ``shuffle_seeded`` (deterministic-per-seed total order, no RNG
    state to broadcast); one global sort, exactly what a seeded
    epoch shuffle costs at scale."""
    ev = _t(spark, sf_dir, "events")
    key = F.md5(F.concat(F.lit("42_"), F.col("event_id").cast("string")))
    from pyspark.sql import Window

    w = Window.orderBy(key, F.col("event_id"))
    return ev.select(
        "event_id", "user_id", F.row_number().over(w).cast("long").alias("pos")
    )


# =====================================================================
# graph_pagerank_verified
# =====================================================================

_PR_DAMP = 0.85
_PR_ITERS = 4


def _pagerank_oracle(iters: int, damping: float) -> str:
    """Unrolled damped power iteration as chained CTEs — the SQL
    restatement of operators/graph.pagerank() (same init, same
    dangling-mass redistribution, same term grouping, same final
    round(+1e-9, 6))."""
    sql = """
    WITH edges AS (
        SELECT DISTINCT user_id % 97 AS src, (user_id * 31 + event_id) % 97 AS dst
        FROM events
    ),
    nodes AS (
        SELECT DISTINCT id FROM (
            SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
        )
    ),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT id, 1.0 / nn.n AS rank FROM nodes, nn)"""
    for i in range(iters):
        sql += f""",
    c{i} AS (
        SELECT e.dst AS id, sum(r.rank / d.deg) AS c
        FROM edges e
        JOIN r{i} r ON r.id = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ),
    dm{i} AS (
        SELECT coalesce(sum(r.rank), 0.0) AS dm
        FROM r{i} r LEFT JOIN deg d ON d.src = r.id
        WHERE d.src IS NULL
    ),
    r{i + 1} AS (
        SELECT n.id,
               (1.0 - {damping}) / nn.n
                 + {damping} * dm{i}.dm / nn.n
                 + {damping} * coalesce(c{i}.c, 0.0) AS rank
        FROM nodes n LEFT JOIN c{i} ON c{i}.id = n.id, nn, dm{i}
    )"""
    sql += f"""
    SELECT id AS node_id, round(rank + 1e-9, 6) AS rank FROM r{iters}
    """
    return sql


@qdef("graph_pagerank_verified", oracle=_pagerank_oracle(_PR_ITERS, _PR_DAMP))
def q_graph_pagerank_verified(spark, sf_dir):
    """The production PageRank loop (operators/graph.pagerank — damped
    power iteration, in-plan dangling-mass fold, per-round
    localCheckpoint) hash-verified: the event graph is projected onto
    97 nodes (user_id mod 97 → arithmetic-derived dst), few enough
    iterations that cross-engine float-sum noise stays far inside the
    round(+1e-9, 6) guard, and the oracle unrolls the identical
    iteration as chained CTEs. Upgrades ``graph_pagerank`` (the
    full-size rows-only twin) from invariant-tested to
    driver-hash-matched arithmetic."""
    from weather4cast_bigdata_spark.operators.graph import pagerank

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        (F.col("user_id") % 97).alias("src"),
        ((F.col("user_id") * 31 + F.col("event_id")) % 97).alias("dst"),
    )
    return pagerank(edges, iters=_PR_ITERS, damping=_PR_DAMP).withColumnRenamed(
        "id", "node_id"
    )


# =====================================================================
# agg_approx_distinct_verified
# =====================================================================


@qdef(
    "agg_approx_distinct_verified",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_exact,
           count(*) AS n,
           TRUE AS hll_within_10pct
    FROM events
    GROUP BY event_type
    """,
)
def q_agg_approx_distinct_verified(spark, sf_dir):
    """The HLL++ sketch (rows-only twin: ``agg_approx_distinct``)
    bound-checked as a first-class value: one pass computes BOTH the
    exact distinct count and the rsd=0.02 estimate, and emits whether
    the estimate landed within 10% (5σ of the configured error) of
    truth. The estimate itself is engine-specific so it never crosses
    the hash; the *claim about it* does — the oracle states the bound
    must hold (TRUE) and recomputes the exact counts. At 100 TB the
    exact column is dropped and only the sketch runs; this query is
    the accuracy evidence for that swap."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact"),
        F.count(F.lit(1)).alias("n"),
        (
            F.abs(
                F.approx_count_distinct("user_id", 0.02)
                - F.count_distinct(F.col("user_id"))
            )
            <= 0.10 * F.count_distinct(F.col("user_id"))
        ).alias("hll_within_10pct"),
    )


# =====================================================================
# solve_ridge_sum1_verified
# =====================================================================


@qdef(
    "solve_ridge_sum1_verified",
    oracle="""
    WITH f AS (
        SELECT value AS p0,
               value * 0.25 + (event_id % 11) AS p1,
               value * 0.6 + (event_id % 5) AS y
        FROM events
    ),
    g AS (
        SELECT sum(p0*p0) / count(*) AS a,
               sum(p0*p1) / count(*) AS b,
               sum(p1*p1) / count(*) AS c,
               sum(p0*y) / count(*) AS d0,
               sum(p1*y) / count(*) AS d1
        FROM f
    ),
    l AS (SELECT *, 1e-4 * ((a + c) / 2.0) AS lam FROM g)
    SELECT 0 AS model_id,
           round((d0 - d1 - b + c + lam) / (a + c + 2*lam - 2*b) + 1e-9, 6) AS weight
    FROM l
    UNION ALL
    SELECT 1,
           round(1.0 - (d0 - d1 - b + c + lam) / (a + c + 2*lam - 2*b) + 1e-9, 6)
    FROM l
    """,
)
def q_solve_ridge_sum1_verified(spark, sf_dir):
    """The Σw=1 constrained ridge fit (ensemble.py:49-57), HASH-
    VERIFIED: 2-predictor system from the events table, distributed
    Gram aggregation, bordered-Lagrange numpy solve at the driver —
    checked against the SQL closed form (eliminating the multiplier
    from the 3×3 bordered system gives
    w0 = (d0−d1−b+c+λ)/(a+c+2λ−2b), w1 = 1−w0). Together with
    ``solve_ridge_verified`` this proves both solver variants'
    arithmetic end-to-end; the fixture-based twins demonstrate the
    k-model path."""
    from weather4cast_bigdata_spark import solve
    from weather4cast_bigdata_spark.operators.aggregates import gram_matrix

    ev = _t(spark, sf_dir, "events")
    f = ev.select(
        F.col("value").alias("p0"),
        (F.col("value") * 0.25 + (F.col("event_id") % 11)).alias("p1"),
        (F.col("value") * 0.6 + (F.col("event_id") % 5)).alias("y"),
    )
    row = gram_matrix(f, ["p0", "p1"], "y").collect()[0]
    ata, aty = solve.gram_row_to_matrices(row, 2)
    w = solve.solve_ridge_sum1(ata, aty)
    return spark.createDataFrame(
        [(i, round(float(x) + 1e-9, 6)) for i, x in enumerate(w)],
        "model_id int, weight double",
    )


# =====================================================================
# scan_binary_roundtrip_verified
# =====================================================================

_ENC_SCHEMA = StructType(
    [StructField("event_id", LongType()), StructField("content", BinaryType())]
)
_DEC_SCHEMA = StructType(
    [StructField("event_id", LongType()), StructField("decoded_value", DoubleType())]
)


@qdef(
    "scan_binary_roundtrip_verified",
    oracle="""
    SELECT event_id, CAST(CAST(value AS REAL) AS DOUBLE) AS decoded_value
    FROM events
    """,
)
def q_scan_binary_roundtrip_verified(spark, sf_dir):
    """The raw-binary decode kernel (np.frombuffer over binaryFile
    content — sources/netcdf.scan_static_raw, datasets.py:145-147)
    hash-verified: stage 1 packs each event value to IEEE-754 float32
    bytes (the writer's side of the wire format), stage 2 decodes
    with the production ``np.frombuffer(dtype=float32)`` kernel —
    both Arrow-batched mapInPandas stages, no driver hop. The oracle
    recomputes the float32 round-trip as CAST(value AS REAL): per-row
    pure IEEE, bit-exact on both engines (numeric policy #1). The
    fixture-lake twins (``scan_static_raw``/``scan_netcdf_decode``)
    stay rows-only because the oracle cannot see their inputs; this
    query pins the byte-level decode arithmetic they share."""
    ev = _t(spark, sf_dir, "events").select("event_id", "value")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "content": [
                        np.float32(v).tobytes() for v in pdf["value"].to_numpy()
                    ],
                }
            )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = [
                float(np.frombuffer(bytes(b), dtype=np.float32)[0])
                for b in pdf["content"]
            ]
            yield pd.DataFrame({"event_id": pdf["event_id"], "decoded_value": vals})

    return ev.mapInPandas(encode, schema=_ENC_SCHEMA).mapInPandas(
        decode, schema=_DEC_SCHEMA
    )


# =====================================================================
# udf_scatter_roundtrip_verified
# =====================================================================


@qdef(
    "udf_scatter_roundtrip_verified",
    oracle="""
    SELECT event_id // 64 AS tile,
           8 AS h, 8 AS w,
           CAST(count(*) AS INT) AS n_px,
           round(sum(CAST(CAST(value AS REAL) AS DOUBLE)) + 1e-9, 6) AS checksum
    FROM events
    GROUP BY 1
    """,
)
def q_udf_scatter_roundtrip_verified(spark, sf_dir):
    """The dense-tensor scatter kernel (the numba-scatter analog,
    inference.assemble_frame_tensors / datasets.py:350-356)
    hash-verified: event_id is mapped to a unique (tile, y, x) cell —
    64 cells per 8×8 tile, no collisions — so each tile's scattered
    float32 grid has a checksum the oracle can restate as a plain
    float32-cast SUM per tile. Proves the applyInPandas group→array
    scatter path (shuffle on keys, Arrow batch per group, float32
    raster arithmetic) end-to-end; the fixture-lake twin
    (``udf_vectorized_kernel``) stays rows-only."""
    from weather4cast_bigdata_spark.operators.inference import assemble_frame_tensors

    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") / 64).cast("bigint").alias("tile"),
        ((F.col("event_id") % 64) / 8).cast("int").alias("y"),
        (F.col("event_id") % 8).cast("int").alias("x"),
        "value",
    )
    out = assemble_frame_tensors(
        ev, keys=["tile"], y_col="y", x_col="x", val_col="value", grid=(8, 8)
    )
    return out.select("tile", "h", "w", "n_px", r6(F.col("checksum")).alias("checksum"))


# =====================================================================
# dedup_semantic_verified
# =====================================================================


@qdef(
    "dedup_semantic_verified",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
        -- centroid count SCALES with the corpus (the SemDeDup
        -- discipline: cluster size stays ~constant, so the
        -- cluster-local pair scan stays linear — a fixed k went
        -- quadratic at the sf1 sweep): the first 8 vectors by id
        -- plus every 250th thereafter.
        SELECT vec_id AS cid, v FROM (
            SELECT vec_id, v,
                   row_number() OVER (ORDER BY vec_id) AS rn
            FROM e
        ) WHERE rn <= 8 OR rn % 250 = 1
    ),
    sims AS (
        SELECT e.vec_id, c.cid,
               list_dot_product(e.v, c.v)
                 / (greatest(sqrt(list_dot_product(e.v, e.v)), 1e-12)
                    * greatest(sqrt(list_dot_product(c.v, c.v)), 1e-12)) AS sim
        FROM e, cent c
    ),
    best AS (
        SELECT vec_id, CAST(cid AS BIGINT) AS cluster,
               round(sim + 1e-9, 6) AS centroid_sim
        FROM (
            SELECT vec_id, cid, sim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cid) AS rn
            FROM sims
        ) WHERE rn = 1
    ),
    pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM best a
        JOIN best b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE round(list_dot_product(ea.v, eb.v)
                    / (sqrt(list_dot_product(ea.v, ea.v))
                       * sqrt(list_dot_product(eb.v, eb.v))) + 1e-9, 6) >= 0.3
    ),
    drops AS (
        SELECT DISTINCT CASE WHEN x.centroid_sim > y.centroid_sim
                               OR (x.centroid_sim = y.centroid_sim
                                   AND a_id > b_id)
                             THEN a_id ELSE b_id END AS d
        FROM pairs
        JOIN best x ON x.vec_id = a_id
        JOIN best y ON y.vec_id = b_id
    )
    SELECT b.vec_id, b.cluster, b.centroid_sim, d.d IS NULL AS kept
    FROM best b LEFT JOIN drops d ON d.d = b.vec_id
    """,
)
def q_dedup_semantic_verified(spark, sf_dir):
    """SemDeDup with the centroid-training step factored out: the
    production drop pass (similarity.semantic_dedup — Arrow matmul
    assignment, cluster-local pair scan, keep-the-outlier rule) runs
    against FIXED centroids (the unit-normalized embeddings of
    vec_id < 8), so every step is SQL-restatable and the whole
    operator hash-matches: assignment argmax (first-max tie-break =
    lowest cid, like np.argmax), rounded centroid similarity,
    cluster-local cosine pairs at τ=0.3, and the deterministic
    drop-the-more-central rule. The rows-only twin
    (``dedup_semantic``) keeps the seeded k-means trainer; this pins
    everything downstream of it.

    The fixed-centroid set SCALES with the corpus (first 8 vectors by
    id + every 250th by rank): with constant k the per-cluster pair
    scan is quadratic in corpus size (caught by the sf1 sweep —
    10x vectors = 100x pairs); rank-strided centroids keep cluster
    populations ~constant, which is how SemDeDup is actually run
    (k proportional to n). The collected centroid matrix is the
    model-state driver contract (n/250 rows), same class as the
    k-means sample cap."""
    from pyspark.sql import Window

    from weather4cast_bigdata_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    rn = F.row_number().over(Window.orderBy("vec_id"))
    rows = (
        emb.select(F.col("embedding").cast("array<double>").alias("v"), "vec_id")
        .withColumn("rn", rn)
        .where((F.col("rn") <= 8) | (F.col("rn") % 250 == 1))
        .orderBy("vec_id")
        .select("v", "vec_id")
        .collect()
    )
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    out = similarity.semantic_dedup(emb, x, threshold=0.3)
    # semantic_dedup labels clusters by centroid-matrix INDEX; the
    # oracle labels them by the centroid's vec_id — map back through
    # the same ordered id list the matrix was built from.
    cid_of = F.array(*[F.lit(int(r["vec_id"])) for r in rows])
    return out.select(
        "vec_id",
        F.element_at(cid_of, F.col("cluster") + 1).cast("long").alias("cluster"),
        "centroid_sim",
        "kept",
    )


# =====================================================================
# quantize_halfeven_parity
# =====================================================================


@qdef(
    "quantize_halfeven_parity",
    oracle="""
    SELECT event_id,
           CAST(m / 2.0 AS DOUBLE) AS denorm,
           CAST(CASE WHEN m % 2 = 0 THEN m // 2
                     WHEN (m // 2) % 2 = 0 THEN m // 2
                     ELSE m // 2 + 1 END AS INT) AS qv_half_even,
           CAST(CASE WHEN m % 2 = 0 THEN m // 2
                     ELSE m // 2 + 1 END AS INT) AS qv_half_up
    FROM (SELECT event_id, event_id % 256 AS m FROM events)
    """,
)
def q_quantize_halfeven_parity(spark, sf_dir):
    """End-to-end parity pin for the numpy round-half-to-EVEN
    quantization quirk (SURVEY.md §2.8; reference uint16 cast at
    datasets.py:379-394 uses ndarray.round = banker's rounding):
    inputs are exact dyadic rationals (m/256 normalized to a [0,128]
    code range ⇒ denormalized values land on exact k or k+0.5), so
    every odd m is a true .5 tie and the two rounding modes of
    ``scalar.quantize`` (half_even=True → bround, default → round)
    provably diverge on exactly the odd-half codes. The oracle
    restates both modes in integer arithmetic — no float rounding
    ambiguity anywhere. Documents the ≤1-code-unit tie behavior as a
    driver-verifiable row instead of a SURVEY footnote."""
    ev = _t(spark, sf_dir, "events")
    # m/256 is exactly representable; ×128 denormalizes to exact m/2
    norm = (F.col("event_id") % 256).cast("double") / F.lit(256.0)
    return ev.select(
        "event_id",
        scalar.minmax_denormalize(norm, 0.0, 128.0).alias("denorm"),
        scalar.quantize(norm, 0.0, 128.0, half_even=True).alias("qv_half_even"),
        scalar.quantize(norm, 0.0, 128.0).alias("qv_half_up"),
    )


# =====================================================================
# multimodal_plumbing_verified
# =====================================================================

_MM_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("md5_prefix", LongType()),
    ]
)


@qdef(
    "multimodal_plumbing_verified",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(('0x' || substring(md5(text), 1, 8)) AS BIGINT) AS md5_prefix
    FROM documents
    """,
)
def q_multimodal_plumbing_verified(spark, sf_dir):
    """The opaque-binary multimodal column path (SURVEY extension:
    binary content + typed metadata → mapInPandas feature extract)
    hash-verified: blobs are built JVM-side from ``documents.text``
    (encode utf-8), then the same Arrow-batched mapInPandas shape the
    image/audio extractors use computes per-blob features the oracle
    can recompute (byte length, md5-prefix id). The codec-gated twins
    (``multimodal_image_features``/``multimodal_audio_features``)
    stay rows-only because their fake-decode fixtures use non-SQL
    PRNG pixels; this pins the binary-column plumbing — schema,
    batching, byte handling — with a cross-engine hash."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("content")
    )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = [bytes(b) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in blobs],
                    "md5_prefix": [
                        int(hashlib.md5(b).hexdigest()[:8], 16) for b in blobs
                    ],
                }
            )

    return docs.mapInPandas(features, schema=_MM_SCHEMA)


# =====================================================================
# quality_model_filter_verified
# =====================================================================


@qdef(
    "quality_model_filter_verified",
    oracle=r"""
    WITH f AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
               length(text)
                   / (len(string_split_regex(trim(text), '\s+')) + 1.0)
                   AS avg_tok_len,
               length(regexp_replace(text, '[^ ]', '', 'g'))
                   / (length(text) + 1.0) AS space_frac
        FROM documents
    ),
    s AS (
        SELECT doc_id, n_tokens,
               1.0 / (1.0 + exp(-(0.0 + 1.0 * avg_tok_len
                                  - 30.0 * space_frac))) AS p
        FROM f
    )
    SELECT doc_id, n_tokens,
           round(p + 1e-9, 6) AS quality_prob,
           round(p + 1e-9, 6) >= 0.5 AS keep
    FROM s
    """,
)
def q_quality_model_filter_verified(spark, sf_dir):
    """The model-based quality gate's SCORING path hash-verified with
    PINNED coefficients (twin: the rows-only ``quality_model_filter``,
    whose L-BFGS fit is iterative and not SQL-expressible — the fit's
    determinism/separation is pinned in tests/test_curate_ext.py).
    Production deploys exactly this split: the classifier is fitted
    once offline, and what runs over the 100 TB corpus is the frozen
    coefficient vector in a narrow projection — THIS query. Same
    feature expressions as ``quality.model_quality_scores``
    (whitespace token count, avg token length, space fraction),
    logistic link over literal weights, keep = rounded p >= 0.5 (the
    r6-before-compare convention keeps the boundary decision in the
    engines' shared domain even for a doc sitting exactly at z = 0)."""
    from weather4cast_bigdata_spark.functions import text as textfn

    docs = _t(spark, sf_dir, "documents")
    toks = textfn.token_count(F.col("text")).cast("double")
    f = docs.select(
        "doc_id",
        textfn.token_count(F.col("text")).cast("long").alias("n_tokens"),
        (F.length("text") / (toks + F.lit(1.0))).alias("avg_tok_len"),
        (
            F.length(F.regexp_replace("text", r"[^ ]", ""))
            / (F.length("text") + F.lit(1.0))
        ).alias("space_frac"),
    )
    p = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(
                F.lit(0.0)
                + F.lit(1.0) * F.col("avg_tok_len")
                - F.lit(30.0) * F.col("space_frac")
            )
        )
    )
    return f.select(
        "doc_id",
        "n_tokens",
        r6(p).alias("quality_prob"),
        (r6(p) >= F.lit(0.5)).alias("keep"),
    )


@qdef(
    "agg_approx_percentile_verified",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n,
           TRUE AS rank_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_agg_approx_percentile_verified(spark, sf_dir):
    """Mergeable-sketch median (Greenwald–Khanna via Spark's
    ``approx_percentile``) BOUND-CHECKED in-plan — the fixed-state
    companion to the exact ``agg_percentile``: at 100 TB the exact
    form's per-group sort is the cost, while GK state is O(1/eps)
    per group and merges associatively across partitions. The
    estimate itself is not cross-engine portable (DuckDB's sketch
    differs), so the driver-hashable surface is the GUARANTEE, not
    the value: the returned element's true rank interval
    [n_lt+1, n_le] (counted with one pass over the group) must
    intersect the target rank n/2 within the documented n/accuracy
    GK bound (+1 discretization slack). The oracle restates the
    exact group counts and pins ``rank_within_bound`` TRUE — a
    sketch regression (or a broken accuracy contract) flips the
    boolean and fails the value hash."""
    li = _t(spark, sf_dir, "lineitem")
    acc = 1000
    g = li.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(l_extendedprice, 0.5, {acc})").alias("apx"),
        F.count(F.lit(1)).alias("n"),
    )
    ranks = (
        li.join(F.broadcast(g), "l_returnflag")
        .groupBy("l_returnflag", "n")
        .agg(
            F.sum(
                F.when(F.col("l_extendedprice") <= F.col("apx"), 1).otherwise(0)
            ).alias("n_le"),
            F.sum(
                F.when(F.col("l_extendedprice") < F.col("apx"), 1).otherwise(0)
            ).alias("n_lt"),
        )
    )
    target = F.col("n") / F.lit(2.0)
    slack = F.col("n") / F.lit(float(acc)) + F.lit(1.0)
    ok = (F.col("n_lt") + F.lit(1) <= target + slack) & (
        F.col("n_le") >= target - slack
    )
    return ranks.select(
        "l_returnflag", F.col("n"), ok.alias("rank_within_bound")
    ).orderBy("l_returnflag")
