"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship evaluate-analog plan at sf0.001;
``queries()`` exposes every implemented SURVEY.md §2 operator;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each
SQL-expressible operator (the driver's correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from weather4cast_bigdata_spark.plans.registry import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from weather4cast_bigdata_spark.plans.flagship import flagship_evaluate

    return flagship_evaluate(spark, "/root/testdata/sf0.001")


# Verification rotation (round 8): rounds 1-7 driver-checked 200
# registry queries cumulatively, 0 value failures ever.  Round 8's
# first-50 window: (1) the NEW query (dedup_minhash_recall) and the
# four LSH queries whose SEMANTICS/ORACLES changed this round (the
# fractional (p, r) split replacing the integral chain — three of
# them also never driver-verified before), (2) the two r3-stale
# deferrals (window_sessionize, solve_ridge_verified — after these,
# every oracle-bearing query has a driver-green row at least once),
# (3) dedup_jaccard_prefix (implementation changed: PPJoin index
# prefix + df>1 prune; oracle unchanged), then (4) 42 of the 49
# remaining r4-green entries — after r8 nothing oracle-bearing is
# older than r4, and the 7 r4 leftovers lead r9:
# sim_ivf_recall, udf_vectorized_kernel, text_top_ngram_char_frac,
# scan_binary_roundtrip_verified, project_pivot_wide,
# partition_subset_select, shuffle_seeded_verified.
# The 8 genuinely rows-only entries (RNG order / sketch estimates /
# k-means training / RNG fixtures) stay pinned to the END of the
# ordering so they never burn a window slot — each is covered by a
# hash-verified sibling or invariant tests
# (tests/test_registry_oracle.py re-checks every rotated-out query
# with the same dtype-strict compare each session).
_ROUND8_PRIORITY = [
    # -- new in r8 / changed semantics / never driver-verified ----------
    "dedup_minhash_recall",
    "sim_lsh_multiprobe",
    "sim_lsh_recall",
    "sim_lsh_banded",
    "sim_hyperplane_lsh",
    "window_sessionize",
    "solve_ridge_verified",
    "dedup_jaccard_prefix",
    # -- re-verification: 42 of the 49 remaining r4-green entries --------
    "embed_pq_codes",
    "graph_pagerank_verified",
    "text_url_dedup",
    "agg_approx_distinct_verified",
    "sample_weighted_priority",
    "multimodal_audio_features",
    "sink_lsh_index",
    "streaming_lsh_ingest",
    "scan_netcdf_decode",
    "dedup_simhash_hamming",
    "text_dsir_weights",
    "multimodal_plumbing_verified",
    "flagship_evaluate",
    "text_dup_line_fraction",
    "sample_dsir_resample",
    "text_perplexity_buckets",
    "scan_static_netcdf",
    "join_asof_offset",
    "sample_random_crop",
    "scan_static_raw",
    "dedup_semantic_verified",
    "sim_pq_adc_topk",
    "quantize_halfeven_parity",
    "join_time_intersect",
    "curation_quality_gate",
    "join_static_broadcast",
    "join_fallback_day",
    "cache_decoded",
    "multimodal_image_features",
    "sim_ivfpq_topk",
    "text_decontaminate_bloom",
    "sink_quantized_partitioned",
    "udf_scatter_roundtrip_verified",
    "text_heavy_hitters_cms",
    "solve_ridge_sum1_verified",
    "sink_ivfpq_index",
    "text_c4_rules",
    "scan_orc_roundtrip",
    "text_line_dedup_global",
    "text_gopher_rules",
    "sink_dsir_model",
    "sample_unimax",
    # ---- 50-entry window boundary ------------------------------------
]

# Single source of truth: registry.py's import-time coverage gate
# asserts this set is exactly the oracle-less queries.
from weather4cast_bigdata_spark.plans.registry import ROWS_ONLY  # noqa: E402

_ROWS_ONLY_LAST = sorted(ROWS_ONLY)


def _ordered_names() -> list[str]:
    seen = set()
    ordered: list[str] = []
    for name in _ROUND8_PRIORITY:
        if name in REGISTRY and name not in seen:
            ordered.append(name)
            seen.add(name)
    tail = set(_ROWS_ONLY_LAST)
    ordered.extend(
        name for name in REGISTRY if name not in seen and name not in tail
    )
    ordered.extend(name for name in _ROWS_ONLY_LAST if name in REGISTRY)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
