"""Query registry — the single source of truth for the engine's declared
query surface (SURVEY.md §2 operator inventory).

Each operator is registered ONCE with its PySpark implementation and (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the same
parquet tables. ``__spark_entry__.py`` re-exports these as ``queries()``
and ``oracle_sql()`` for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}

# Driver-facing registration order. The correctness driver checks the FIRST
# 50 registered queries. The window ROTATES across rounds (VERDICT r3 #1) so
# every declared operator earns a hard driver CORRECTNESS row at least once:
# names past the cap were driver-green in earlier rounds (round noted in git
# history / prior CORRECTNESS files) and stay oracle-checked every round by
# the local parity replica (tests/test_oracle_parity.py).
#
# r9 window policy (executed this round, as pre-declared in r8): the
# twelve r8-registered additions lead for their FIRST driver rows
# (pipeline_ivf_pq_search … text_dedup_span_rewrite), followed by the two
# r9-changed implementations — agg_exact_moments (r8's one red row: its
# int128 var_numer now ships in the engine-stable STRING form, ADVICE r8)
# and src_pdf_scan (indirect-/Length backtracking fix + unsupported-filter
# rejection, ADVICE r8) — then the every-round flagship, ten §2/streaming
# anchors, the thirteen operators REGISTERED NEW in r9 (dedup_incremental_lsh,
# dedup_band_bucket_stats, agg_kmv_shard_merge, join_asof_tolerance,
# privacy_l_diversity_audit, sink_schema_evolution_merge,
# agg_autocorr_lag1, src_fixed_width_scan, win_interval_union_length,
# privacy_t_closeness_audit, win_rolling_median_exact,
# sample_poisson_bootstrap, sink_manifest_atomic_swap, dq_merkle_checksum,
# sample_weighted_priority, geo_grid_nn_join, dq_benford_audit,
# sink_dynamic_partition_overwrite, src_multiline_log_scan,
# pipeline_antientropy_repair — inserted ahead of the refresh slots, as
# this policy requires for new registrations), and 5 REFRESH slots for
# the rows whose last hard driver green is oldest (five of the seven
# r1-era rows).
#
# r10 window policy (pre-declared so the rotation promise stays kept):
# any r9-registered additions and r9-changed implementations that did not
# earn a green row in CORRECTNESS_r09 lead, then the flagship and §2
# anchors, then the next-oldest refresh cohort (the remaining r3-era rows:
# proj_select_alias, flt_compound_predicate, fn_dict_normalize,
# fn_timestamps, fn_code_parse, fn_case_classify, graph_count_by_label,
# join_consistency_antijoin, join_left_semi, mm_binary_features,
# mm_metadata_struct, sort_limit, arr_contains_lookup, plus the twenty
# r1/r3-era rows the r9 additions displaced: mm_frame_sample,
# set_intersect_except, dedup_exact, sim_cosine_topk, win_lag_running_sum, text_fingerprint,
# graph_reachability, join_two_hop, dedup_merge_most_complete,
# dedup_docs_exact, fn_hash_uid, src_json_flatten, sink_upsert_edge,
# agg_group_topn, agg_topk, agg_collect_set, mm_image_decode,
# text_lang_id, text_quality_score, text_token_count).
CORE_ORDER = [
    "pipeline_ivf_pq_search",
    "pipeline_entity_resolution",
    "agg_ks_drift",
    "stream_full_join_timeout",
    "sample_reservoir_bottomk",
    "dedup_url_canonicalize",
    "sink_compact_small_files",
    "privacy_dp_counts",
    "agg_chi2_drift",
    "win_rolling_zscore_outliers",
    "sink_vacuum_retention",
    "text_dedup_span_rewrite",
    "agg_exact_moments",
    "src_pdf_scan",
    "join_four_hop_chain",
    "src_csv_scan",
    "sink_upsert_node",
    "sink_merge_prefer_nonempty",
    "flt_blocklist_predicate",
    "fn_regexp_extract_all",
    "join_broadcast_inner",
    "join_left_anti",
    "agg_multi_counter",
    "win_row_number_dedup",
    "stream_incremental_upsert",
    # -- r9-registered additions: first driver rows, ahead of refresh slots --
    "dedup_incremental_lsh",
    "dedup_band_bucket_stats",
    "agg_kmv_shard_merge",
    "join_asof_tolerance",
    "privacy_l_diversity_audit",
    "sink_schema_evolution_merge",
    "agg_autocorr_lag1",
    "src_fixed_width_scan",
    "win_interval_union_length",
    "privacy_t_closeness_audit",
    "win_rolling_median_exact",
    "sample_poisson_bootstrap",
    "sink_manifest_atomic_swap",
    "dq_merkle_checksum",
    "sample_weighted_priority",
    "geo_grid_nn_join",
    "dq_benford_audit",
    "sink_dynamic_partition_overwrite",
    "src_multiline_log_scan",
    "pipeline_antientropy_repair",
    # -- refresh slots: rows whose last hard driver green is oldest --
    "agg_salted_skew",
    "dedup_minhash_signatures",
    "graph_degree_distribution",
    "graph_orphan_antijoin",
    "graph_pattern_match",
    "mm_frame_sample",
    "set_intersect_except",
    "dedup_exact",
    "sim_cosine_topk",
    "win_lag_running_sum",
    "text_fingerprint",
    "graph_reachability",
    "join_two_hop",
    "dedup_merge_most_complete",
    "dedup_docs_exact",
    "fn_hash_uid",
    "src_json_flatten",
    "sink_upsert_edge",
    "agg_group_topn",
    "agg_topk",
    "agg_collect_set",
    "mm_image_decode",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "src_jsonl_scan",
    "src_format_sniff",
    "text_html_strip",
    "text_gopher_rules",
    "text_winnowing_fingerprint",
    "dedup_lsh_recall_contract",
    "dedup_shingle_containment",
    "embed_jl_projection",
    "embed_pq_codes",
    "embed_sign_hamming_topk",
    "sim_ann_pq_adc",
    "agg_bitmap_exact_distinct",
    "agg_gini_concentration",
    "agg_linear_trend",
    "agg_markov_transitions",
    "graph_assortativity",
    "graph_hits",
    "graph_modularity",
    "graph_random_walks",
    "join_scd2_asof",
    "mm_audio_vad_segments",
    "mm_image_ahash_dedup",
    "pipeline_incremental_ingest",
    "privacy_kanonymity_audit",
    "sample_inbatch_negatives",
    "sample_upsample_epochs",
    "sink_time_travel_read",
    "stream_dedup_within_watermark",
    "win_max_drawdown",
    "win_rolling_range_1h",
    "win_share_of_parent",
    "dedup_semdedup_clusters",
    "graph_jaccard_similarity",
    "graph_copurchase_project",
    "dedup_embedding_cosine",
    "agg_countmin_contract",
    "sim_ann_recall_contract",
    "src_docx_scan",
    "src_orc_scan",
    "stream_watermark_late",
    "stream_interval_join",
    "text_line_dedup",
    "mm_image_resize",
    "graph_label_propagation",
    "text_bigram_lm_score",
    "embed_pca_power",
    "stream_left_join_timeout",
    "sink_zorder_write",
    "join_salted_skew",
    "mm_video_scene_cut",
    "agg_hll_mergeable",
    "pipeline_multimodal_curation",
    "dedup_prefix_containment",
    "agg_exact_median",
    "join_bucketed_colocated",
    "stream_stateful_session_timeout",
    "win_ohlc_resample",
    "text_ngram_novelty",
    "win_ewma_by_user",
    "agg_group_mode",
    "graph_connected_components_star",
    "join_interval_overlap",
    "graph_kcore_bounded",
    "graph_sssp_bounded",
    "cdc_apply_changefeed",
    "sim_ann_ivf_trained",
    "explode_split_targets",
    "join_bloom_prefilter",
    "agg_kmv_distinct_intersection",
    "dedup_ngram_spans",
    "win_running_distinct",
    "pipeline_training_dataset",
    "text_pack_sequences",
    "agg_equidepth_histogram",
    "stream_sliding_hourly",
    "sample_temperature_mix",
    "win_gapfill_hourly",
    "sim_kmeans_assign",
    "win_retention_cohorts",
    "agg_event_cooccurrence",
    "doc_rule_extract",
    "src_xlsx_scan",
    "join_asof_nearest",
    "stream_session_window",
    "sink_partitioned_prune",
    "embed_quantize_error_contract",
    "win_sliding_hourly",
    "dedup_fuzzy_names",
    "sim_kmeans_iterate",
    "graph_triangle_count",
    "join_left_semi",
    "mm_audio_frame_rms",
    "embed_quantize_int8",
    "text_pii_scrub",
    "dedup_cluster_keep",
    "agg_heavy_hitters",
    "stream_stateful_running",
    "dq_expectations",
    "cdc_snapshot_diff",
    "scd2_history",
    "win_funnel_conversion",
    "sample_weighted_tokens",
    "graph_pagerank",
    "text_tfidf_topk",
    "text_chunk_overlap",
    "stream_dedup_keys",
    "agg_mad_outliers",
    "set_union",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "pipeline_corpus_curation",
    "win_session_batch",
    "win_tumbling_hourly",
    "stream_tumbling_hourly",
    "dedup_simhash_hamming",
    "join_time_range",
    "split_train_holdout",
    "sample_domain_mix",
    "sample_stratified_exact",
    "text_token_budget",
    "profile_table_stats",
    "agg_histogram",
    "agg_winsorize",
    "agg_approx_distinct",
    "win_asof_last_click",
    "agg_rollup",
    "agg_pivot",
    "agg_cube",
    "win_rank_frames",
    "graph_connected_components",
    "text_repetition_ratio",
    "text_decontaminate",
    "agg_approx_quantiles",
    "graph_count_by_label",
    "proj_select_alias",
    "flt_compound_predicate",
    "fn_dict_normalize",
    "fn_timestamps",
    "fn_code_parse",
    "fn_case_classify",
    "join_consistency_antijoin",
    "agg_count_by_label",
    "agg_global_count",
    "sort_limit",
    "arr_contains_lookup",
    "mm_binary_features",
    "mm_metadata_struct",
]

# SURVEY-declared rows rotated out of the driver window after earning green
# driver CORRECTNESS rows in earlier rounds (round noted above). Each stays
# oracle-checked locally every round; test_library asserts the partition.
ROTATED_OUT = {
    "src_json_flatten", "sink_upsert_edge", "fn_hash_uid",
    "win_lag_running_sum", "dedup_exact", "sim_cosine_topk",
    "agg_collect_set", "agg_count_by_label", "agg_global_count",
    "agg_group_topn", "agg_topk", "arr_contains_lookup", "dedup_docs_exact",
    "dedup_embedding_cosine", "dedup_merge_most_complete", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "flt_compound_predicate", "fn_case_classify",
    "fn_code_parse", "fn_dict_normalize", "fn_timestamps",
    "explode_split_targets",
    "graph_count_by_label", "graph_reachability", "join_consistency_antijoin",
    "join_left_semi", "join_two_hop", "mm_binary_features", "mm_image_decode",
    "mm_metadata_struct", "pipeline_corpus_curation", "proj_select_alias",
    "set_union", "sort_limit", "text_fingerprint", "text_lang_id",
    "text_quality_score", "text_token_count", "win_session_batch",
    "win_tumbling_hourly",
}

# Queries the driver must hard-check — one per SURVEY §2 row. The test
# suite asserts each sits within the first DRIVER_CAP registrations.
DRIVER_CAP = 50


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", tags=tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every query module so registration side effects run."""
    import graph_etl_pipeline_spark.queries  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    """All registered queries in driver-facing order: CORE_ORDER first
    (SURVEY-declared inside the driver's check window), then any
    unlisted additions in registration order."""
    _load_all()
    ordered = {n: _REGISTRY[n] for n in CORE_ORDER if n in _REGISTRY}
    ordered.update({n: s for n, s in _REGISTRY.items() if n not in ordered})
    return ordered


def query_map() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_map() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
