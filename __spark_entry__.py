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


# Verification rotation (round 7): rounds 1-6 driver-checked 199
# registry queries cumulatively, 0 value failures ever; after r6 no
# query's latest green hash row is older than r3.  Round 7's
# first-50 window = the three queries whose SEMANTICS or ORACLE
# changed this round (the streaming exact-dedup oracle restated over
# the union corpus per ADVICE r6; the two embedding queries moved to
# scale-adaptive LSH resolution) plus the one NEW query
# (agg_percentile_histref), then 46 of the 48 r3-stale queries,
# exactly filling the 50 slots; the two left out (window_sessionize —
# a bench headline oracle-replayed every test session — and
# solve_ridge_verified — a pinned-constant deterministic solve) are
# the least rot-prone entries and lead the r8 rotation.  The 8
# genuinely rows-only
# entries (RNG order / sketch estimates / k-means training / RNG
# fixtures) stay pinned to the END of the ordering so they never burn
# a window slot — each is covered by a hash-verified sibling or
# invariant tests (tests/test_registry_oracle.py re-checks every
# rotated-out query with the same dtype-strict compare each session).
_ROUND7_PRIORITY = [
    # -- new in r7 (never driver-checked) --------------------------------
    "agg_percentile_histref",
    # -- r7 semantic/oracle changes (must re-green under the new form):
    # exact-dedup oracle restated over the union corpus; the two
    # embedding queries moved to scale-adaptive LSH resolution -----------
    "streaming_exact_dedup_ingest",
    "dedup_embedding_cosine",
    "sim_hyperplane_lsh",
    # -- re-verification: the r3-stale set (46 of 48) --------------------
    "agg_mode_deterministic",
    "agg_moments",
    "agg_string_concat",
    "agg_winsorize",
    "audit_constraints",
    "audit_profile",
    "curation_report",
    "curation_source_stats",
    "dedup_minhash_estimate",
    "dedup_substring_spans",
    "dim_scd2_build",
    "embed_quantize_int8",
    "flagship_pricing_summary",
    "flagship_star_join",
    "graph_triangles",
    "join_fuzzy_blocked",
    "join_interval_overlap",
    "join_point_in_time",
    "join_range_binned",
    "join_salted",
    "join_semi_anti",
    "pack_chunked",
    "project_unpivot_long",
    "project_zorder_key",
    "sample_exact_k_per_group",
    "sample_mixture_weighted",
    "sample_topk_per_group",
    "sink_compacted",
    "sink_ivf_index",
    "sink_merge_upsert",
    "sink_zorder",
    "streaming_checkpoint_resume",
    "streaming_ewma",
    "streaming_static_enrich",
    "text_bigram_logprob",
    "text_chunk_overlap",
    "text_decontaminate",
    "text_inverted_index",
    "text_pii_redact",
    "text_pmi_collocations",
    "text_repetition_score",
    "text_tfidf_topk",
    "window_ewma",
    "window_range_trailing",
    "window_rank_stats",
    "window_resample_interpolate",
    # ---- 50-entry window boundary ------------------------------------
    # r8 head: the two r7 LSH additions verified only by the session
    # gate so far, then the two stale entries that didn't fit
    # (window_sessionize is a bench headline oracle-replayed every test
    # session; solve_ridge_verified is a pinned-constant solve)
    "sim_lsh_multiprobe",
    "sim_lsh_recall",
    "window_sessionize",
    "solve_ridge_verified",
    # r7-changed implementation (shingle kernel + census join), r4 green;
    # next in line if the window ever widens
    "dedup_jaccard_prefix",
]

# Single source of truth: registry.py's import-time coverage gate
# asserts this set is exactly the oracle-less queries.
from weather4cast_bigdata_spark.plans.registry import ROWS_ONLY  # noqa: E402

_ROWS_ONLY_LAST = sorted(ROWS_ONLY)


def _ordered_names() -> list[str]:
    seen = set()
    ordered: list[str] = []
    for name in _ROUND7_PRIORITY:
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
