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


# Verification rotation (round 6): rounds 1-5 driver-checked 194
# registry queries cumulatively, 0 value failures ever; after r5 no
# query's latest green hash row is older than r2.  Round 6's
# first-50 window = the NEW r6 query (the streaming submission-h5
# manifest), then ALL 43 queries whose latest green row is r2 (the
# §2.7 array/string family, the streaming twins, the r2 extension
# wave), then the alphabetical head of the r3-green set.  The 8
# genuinely rows-only entries (RNG order / sketch estimates /
# k-means training / RNG fixtures) stay pinned to the END of the
# ordering so they never burn a window slot — each is covered by a
# hash-verified sibling or invariant tests
# (tests/test_registry_oracle.py re-checks every rotated-out query
# with the same dtype-strict compare each session).
_ROUND6_PRIORITY = [
    # -- new in r6 (never driver-checked) --------------------------------
    "streaming_submission_h5",
    "sink_exact_dedup_index",
    "agg_approx_percentile_verified",
    "dedup_ngram_containment",
    "streaming_exact_dedup_ingest",
    # -- re-verification: every query whose last green row is r2 ---------
    "array_concat",
    "array_flatten",
    "array_slice_2d",
    "array_stack_channels",
    "array_transpose",
    "crr_combo_switch",
    "curation_pipeline",
    "dedup_connected_components",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_signature",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "join_asof_nearest",
    "join_bucketed_colocated",
    "json_get",
    "multimodal_frame_sample",
    "plot_frame_grid",
    "sample_augment",
    "sample_stratified_split",
    "scan_csv_roundtrip",
    "scan_jsonl_roundtrip",
    "sim_cosine_bucketed",
    "sim_cosine_topk",
    "sim_cosine_topk_blas",
    "sim_hyperplane_lsh",
    "str_format_path",
    "str_parse_ts",
    "str_replace",
    "streaming_dedup",
    "streaming_running_gram",
    "streaming_session_windows",
    "streaming_sliding_windows",
    "streaming_stateful_assembly",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_strip_markup",
    "text_token_count",
    "text_unigram_logprob",
    "text_vocab_topk",
    "udf_batch_inference",
    # -- r3-green head fills the remaining slots --------------------------
    "agg_entropy",
    "agg_histogram",
    # ---- 50-entry window boundary ------------------------------------
    # remaining r3/r4/r5-verified queries (newest green row last), then
    # the 8 rows-only entries dead last (never in a window).
]

# Single source of truth: registry.py's import-time coverage gate
# asserts this set is exactly the oracle-less queries.
from weather4cast_bigdata_spark.plans.registry import ROWS_ONLY  # noqa: E402

_ROWS_ONLY_LAST = sorted(ROWS_ONLY)


def _ordered_names() -> list[str]:
    seen = set()
    ordered: list[str] = []
    for name in _ROUND6_PRIORITY:
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
