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


# Verification rotation (round 3): rounds 1+2 driver-checked 100 of
# 167 registry queries (98 green; the 2 hash fails were oracle
# HUGEINT→float64 dtype coercions, fixed this round).  67 queries
# have never had a driver correctness row.  This round's first-50
# window = the 2 re-fixed queries (must re-enter the gate to prove
# the CAST fix) + 48 of the 51 oracle-bearing never-verified queries.
# Deferred to round 4: sample_random_crop / scan_orc_roundtrip /
# project_pivot_wide (each has a driver-green sibling of the same
# plan family: sample_augment+sample_stratified_split,
# scan_jsonl/csv_roundtrip, project_unpivot_long), then the 16
# rows-only entries, then the driver-green backlog.
# tests/test_registry_oracle.py guards rotated-out queries against
# regression every session with the same (now dtype-strict) compare.
_ROUND3_PRIORITY = [
    # -- round-2 hash-fail fixes: re-verify first ----------------------
    "curation_source_stats",
    "window_sessionize",
    # -- flagship analytics / OLAP extensions --------------------------
    "flagship_star_join",
    "flagship_pricing_summary",
    "dim_scd2_build",
    "join_point_in_time",
    "agg_histogram",
    "agg_mode_deterministic",
    "agg_string_concat",
    "agg_entropy",
    "agg_winsorize",
    "agg_moments",
    "audit_constraints",
    "audit_profile",
    # -- joins ----------------------------------------------------------
    "join_fuzzy_blocked",
    "join_range_binned",
    "join_semi_anti",
    "join_interval_overlap",
    "join_salted",
    # -- windows --------------------------------------------------------
    "window_ewma",
    "window_rank_stats",
    "window_range_trailing",
    "window_resample_interpolate",
    # -- text / curation wave-3 ----------------------------------------
    "text_tfidf_topk",
    "text_decontaminate",
    "text_pii_redact",
    "text_repetition_score",
    "text_inverted_index",
    "text_chunk_overlap",
    "text_bigram_logprob",
    "text_pmi_collocations",
    "pack_chunked",
    "curation_report",
    # -- dedup stragglers -----------------------------------------------
    "dedup_minhash_estimate",
    "dedup_substring_spans",
    # -- sampling -------------------------------------------------------
    "sample_mixture_weighted",
    "sample_topk_per_group",
    "sample_exact_k_per_group",
    # -- graph ----------------------------------------------------------
    "graph_triangles",
    # -- projections / sinks / layout -----------------------------------
    "project_unpivot_long",
    "project_zorder_key",
    "sink_compacted",
    "sink_merge_upsert",
    "sink_zorder",
    "sink_ivf_index",
    "embed_quantize_int8",
    # -- solver / streaming ---------------------------------------------
    "solve_ridge_verified",
    "streaming_static_enrich",
    "streaming_ewma",
    "streaming_checkpoint_resume",
    # ---- 50-entry window boundary ------------------------------------
    # round-4 spillover: oracle-bearing deferred trio first, then the
    # rows-only never-verified set, then the driver-green backlog.
    "sample_random_crop",
    "scan_orc_roundtrip",
    "project_pivot_wide",
    # round-3 additions (oracle-bearing, strict-local-green)
    "dedup_jaccard_prefix",
    "text_decontaminate_bloom",
    "text_heavy_hitters_cms",
    "sample_weighted_priority",
    "embed_pq_codes",
    "sim_pq_adc_topk",
    "sink_lsh_index",
    "sim_ivfpq_topk",
    # hash-verified siblings of the rows-only families (added r3;
    # oracle-bearing, strict-local-green — driver window in r4)
    "shuffle_seeded_verified",
    "graph_pagerank_verified",
    "agg_approx_distinct_verified",
    "solve_ridge_sum1_verified",
    "scan_binary_roundtrip_verified",
    "udf_scatter_roundtrip_verified",
    "quantize_halfeven_parity",
    "multimodal_plumbing_verified",
    "dedup_semantic_verified",
    "sim_ivf_topk",
    "sim_ivf_recall",
    "agg_approx_distinct",
    "graph_pagerank",
    "quality_model_filter",
    "dedup_semantic",
    "multimodal_image_features",
    "multimodal_audio_features",
    "scan_netcdf_decode",
    "scan_static_netcdf",
    "scan_static_raw",
    "sink_quantized_partitioned",
    "cache_decoded",
    "udf_vectorized_kernel",
    "solve_ridge",
    "solve_ridge_sum1",
]


def _ordered_names() -> list[str]:
    seen = set()
    ordered: list[str] = []
    for name in _ROUND3_PRIORITY:
        if name in REGISTRY and name not in seen:
            ordered.append(name)
            seen.add(name)
    ordered.extend(name for name in REGISTRY if name not in seen)
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
