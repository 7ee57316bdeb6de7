#!/usr/bin/env python
"""Regenerate COVERAGE.md from the query registry.

Run from the repo root: ``python tools/gen_coverage.py``. Fails if a
registry key is missing from the section map (forcing the map to stay
in sync with SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather4cast_bigdata_spark.plans.registry import REGISTRY  # noqa: E402

SECTIONS = {
    "§2.1 Scans / sources / sinks": ["scan_file_index", "scan_netcdf_decode", "scan_fallback_source", "scan_static_netcdf", "scan_static_raw", "partition_subset_select", "sink_quantized_partitioned", "sink_submission_h5", "cache_decoded"],
    "§2.2 Projections / filters": ["project_minmax_normalize", "predicate_fill_detect", "impute_mean_nonfill", "impute_constant", "project_affine_geo", "project_clamp_scale", "project_log_clamp", "project_logit", "project_normlogit", "project_inv_normlogit", "project_quantize", "project_channel_select", "conditional_where", "filter_region_membership", "filter_valid_sequence", "predicate_rain_event"],
    "§2.3 Joins": ["join_time_intersect", "join_multichannel", "join_static_broadcast", "join_asof_offset", "join_frame_lookup", "join_ensemble_align", "join_fallback_day"],
    "§2.4 Aggregations": ["agg_mean_nonfill", "agg_global_max", "agg_bool_any", "agg_mse", "agg_rounded_mse", "agg_normlogit_mse", "agg_weighted_multiloss", "agg_gram_matrix", "agg_running_mean", "agg_correlation_matrix", "agg_count_sequences", "agg_distinct_times"],
    "§2.5 Windows / time series": ["window_past_sequence", "window_future_horizon", "interval_arith", "window_prev_day_fallback", "day_boundary_correct"],
    "§2.6 Sorts / set ops / sampling": ["sort_time", "set_intersect", "set_distinct", "shuffle_seeded", "sample_random_crop", "sample_augment", "argmin_checkpoint"],
    "§2.7 Array / string / date functions": ["array_stack_channels", "array_slice_2d", "array_concat", "array_transpose", "array_flatten", "str_parse_ts", "str_format_path", "str_replace"],
    "§2.8 UDF / inference": ["udf_vectorized_kernel", "udf_batch_inference", "udf_ensemble_blend", "solve_ridge", "solve_ridge_sum1", "solve_ridge_verified", "crr_combo_switch"],
    "Extensions: dedup (training-data pipeline)": ["dedup_exact", "dedup_minhash_signature", "dedup_minhash_lsh", "dedup_minhash_recall", "dedup_minhash_estimate", "dedup_simhash", "dedup_ngram_jaccard", "dedup_jaccard_prefix", "dedup_embedding_cosine", "dedup_connected_components", "dedup_substring_spans", "dedup_semantic", "dedup_simhash_hamming", "dedup_ngram_containment", "sink_lsh_index", "sink_exact_dedup_index", "graph_pagerank", "graph_triangles"],
    "Extensions: similarity search": ["sim_cosine_topk", "sim_cosine_topk_blas", "sim_cosine_bucketed", "sim_ivf_topk", "sim_ivf_recall", "sim_hyperplane_lsh", "sim_lsh_multiprobe", "sim_lsh_multiprobe_bounded", "sim_lsh_banded", "sim_lsh_banded_hiword", "sim_lsh_recall", "embed_quantize_int8", "embed_pq_codes", "sim_pq_adc_topk", "sim_ivfpq_topk", "sink_ivf_index", "sink_ivfpq_index"],
    "Extensions: multimodal": ["multimodal_image_features", "multimodal_frame_sample", "multimodal_audio_features"],
    "Extensions: text analysis": ["text_lang_id", "text_quality_score", "text_token_count", "text_fingerprint", "text_vocab_topk", "text_unigram_logprob", "text_strip_markup", "text_tfidf_topk", "text_pii_redact", "text_repetition_score", "text_bigram_logprob", "text_inverted_index", "text_pmi_collocations", "quality_model_filter", "text_heavy_hitters_cms"],
    "Extensions: curation wave 3": ["text_decontaminate", "text_decontaminate_bloom", "sample_mixture_weighted", "sample_topk_per_group", "sample_exact_k_per_group", "sample_weighted_priority", "pack_chunked", "text_chunk_overlap", "window_ewma", "agg_winsorize"],
    "Extensions: curation quality battery (r4)": ["text_gopher_rules", "text_c4_rules", "text_dup_line_fraction", "text_top_ngram_char_frac", "text_url_dedup", "curation_quality_gate", "text_dsir_weights", "sample_dsir_resample", "sample_unimax", "text_line_dedup_global", "text_perplexity_buckets", "sink_dsir_model"],
    "Extensions: relational / windows": ["json_get", "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_approx_distinct", "agg_percentile", "agg_percentile_histref", "window_sessionize", "window_range_trailing", "project_pivot_wide", "join_asof_nearest", "join_range_binned", "join_interval_overlap", "project_unpivot_long", "agg_histogram", "agg_moments", "agg_mode_deterministic", "window_rank_stats", "agg_string_concat", "join_semi_anti", "join_fuzzy_blocked", "window_resample_interpolate"],
    "Extensions: scale infrastructure": ["agg_salted", "join_salted", "join_bucketed_colocated", "sample_stratified_split", "scan_jsonl_roundtrip", "scan_csv_roundtrip", "scan_orc_roundtrip", "sink_compacted", "sink_zorder", "project_zorder_key", "sink_merge_upsert", "dim_scd2_build", "join_point_in_time", "audit_constraints", "audit_profile", "agg_entropy"],
    "Extensions: streaming": ["streaming_sliding_windows", "streaming_stateful_assembly", "streaming_running_gram", "streaming_session_windows", "streaming_dedup", "streaming_ewma", "streaming_checkpoint_resume", "streaming_static_enrich", "streaming_lsh_ingest", "streaming_submission_h5", "streaming_exact_dedup_ingest"],
    "Flagship": ["flagship_evaluate", "flagship_star_join", "flagship_pricing_summary", "curation_pipeline", "curation_source_stats", "curation_report"],
    "Hash-verified siblings of rows-only families (r3)": ["shuffle_seeded_verified", "graph_pagerank_verified", "agg_approx_distinct_verified", "solve_ridge_sum1_verified", "scan_binary_roundtrip_verified", "udf_scatter_roundtrip_verified", "quantize_halfeven_parity", "multimodal_plumbing_verified", "dedup_semantic_verified", "quality_model_filter_verified", "agg_approx_percentile_verified"],
    "Visualization data ops": ["plot_frame_grid"],
}

HEADER = """# COVERAGE — SURVEY.md §2 operator IDs → driver-verified queries

Generated by `tools/gen_coverage.py` from
`weather4cast_bigdata_spark/plans/registry.py` (the source of
`__spark_entry__.queries()` / `oracle_sql()`). Check = `oracle` means
the driver hash-matches the query against DuckDB at sf0.01;
`rows-only` is the weaker driver check for ops whose output is not
SQL-expressible (binary decode, seeded sampling, streaming,
driver-side solves). Every SURVEY §2 ID appears exactly once.
"""


def main() -> None:
    listed = [q for qs in SECTIONS.values() for q in qs]
    missing = [k for k in REGISTRY if k not in listed]
    assert not missing, f"unlisted registry keys: {missing}"

    lines = [HEADER]
    n_or = n_ro = 0
    for sec, qs in SECTIONS.items():
        lines.append(f"## {sec}\n")
        lines.append("| ID | check | summary |")
        lines.append("|---|---|---|")
        for q in qs:
            qd = REGISTRY.get(q)
            if qd is None:
                lines.append(f"| `{q}` | MISSING | |")
                continue
            chk = "oracle" if qd.oracle else "rows-only"
            n_or, n_ro = n_or + bool(qd.oracle), n_ro + (not qd.oracle)
            doc = " ".join(qd.doc.split())
            if len(doc) > 110:
                doc = doc[:107] + "..."
            lines.append(f"| `{q}` | {chk} | {doc} |")
        lines.append("")
    lines.append(f"**Totals: {len(REGISTRY)} queries — {n_or} oracle-checked, {n_ro} rows-only.**")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote COVERAGE.md: {len(REGISTRY)} queries, {n_or} oracle, {n_ro} rows-only")


if __name__ == "__main__":
    main()
