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
# names in ROTATED_OUT below were driver-green in r1-r3 and now sit past the
# cap (still oracle-checked every round by the local parity replica,
# tests/test_oracle_parity.py).
#
# r5 window policy (VERDICT r4 #2): FIRST-TIME rows take absolute priority —
# the r4 third wave (dedup_fuzzy_names, win_retention_cohorts,
# sim_kmeans_assign, agg_event_cooccurrence, win_sliding_hourly) plus every
# query ADDED this round lead the window so each earns its first hard driver
# row. embed_quantize_int8 keeps a slot (r4's only red row — output reshaped
# to a scalar string, must re-confirm green), as do the flagship and the
# queries whose implementations materially changed in r5 (pack-sequences
# integer bucket math, the newer-wins merge inner-restriction inside
# stream_incremental_upsert). Multiply-confirmed r4-green rows rotate past
# the cap to make room (win_asof_last_click, agg_rollup, agg_pivot,
# agg_cube, win_rank_frames, graph_connected_components,
# text_repetition_ratio, text_decontaminate, agg_approx_quantiles — all
# hash-green in CORRECTNESS_r04; still oracle-checked locally every round).
# Names not listed here (future additions) append at the end in
# registration order. tests/test_library.py asserts the invariants.
CORE_ORDER = [
    # -- never driver-checked: r4 third wave (VERDICT r4 #2) --
    "dedup_fuzzy_names",       # token-blocked Levenshtein entity resolution
    "win_retention_cohorts",   # first-seen-week cohorts × return-week offsets
    "sim_kmeans_assign",       # broadcast-centroid K-means assignment step
    "agg_event_cooccurrence",  # per-user event-type pair support counts
    "win_sliding_hourly",      # overlapping sliding windows via slide explode
    # -- new in r5: first driver rows --
    "sim_kmeans_iterate",      # full Lloyd rounds, unrolled closed-form oracle
    "src_xlsx_scan",           # xlsx ingestion (reference's primary input format)
    "doc_rule_extract",        # binary doc → extracted rule rows pipeline
    "sim_ann_ivf_trained",     # IVF over trained k-means cells + recall contract
    "stream_session_window",   # T4 via native streaming session_window state
    "sample_temperature_mix",  # τ=0.5 tempered domain mixing, exact-float recipe
    "embed_quantize_error_contract",  # int8 round-trip error bound, in-query
    "cdc_apply_changefeed",    # CDC consumer side: I/U/D feed applied in one join
    "graph_copurchase_project",  # bipartite projection w/ basket-bounded pair join
    "sink_partitioned_prune",  # hive-partitioned write + listing-time pruning
    "join_asof_nearest",       # nearest-side asof via shared-sort dual windows
    "win_gapfill_hourly",      # dense hour grid generated, not shuffled
    "agg_equidepth_histogram", # ntile profile, total tie-break
    "mm_audio_frame_rms",      # PCM framing + exact-int RMS via mapInPandas
    "graph_kcore_bounded",     # bounded peel rounds, |E|-bounded cost
    "stream_sliding_hourly",   # hopping windows through the streaming engine
    "pipeline_training_dataset",  # decontam -> scrub -> floor -> split, one pass
    # -- r4 red row, fixed in r5: must re-confirm --
    "embed_quantize_int8",     # output reshaped: q_embedding now a scalar string
    # -- r5-changed implementations: re-confirm --
    "text_pack_sequences",     # integer div/pmod bucket keys (ADVICE r4)
    "stream_incremental_upsert",  # newer-wins merge inner-restricted (VERDICT #5)
    "join_four_hop_chain",     # J5 flagship — a hard row every round
    # -- r4 second wave, driver-green r4, retained while slots allow --
    "sim_ann_ivf",             # approximate by construction → rows-only row
    "text_pii_scrub",          # typed-placeholder redaction + audit counts
    "dedup_cluster_keep",      # LSH pairs → CC → canonical retention
    "agg_heavy_hitters",       # Misra-Gries sketch + exact contract
    "stream_stateful_running", # applyInPandasWithState running totals
    "dq_expectations",         # declarative ingest-gate audit rows
    "cdc_snapshot_diff",       # snapshot diff → insert/update/delete rows
    "scd2_history",            # type-2 validity intervals, one exchange
    "win_funnel_conversion",   # 3-stage funnel, one shuffle via chained windows
    "sample_weighted_tokens",  # integer systematic length-weighted sampling
    "graph_pagerank",          # fixed-point int64 PageRank, 3 Pregel rounds
    "text_tfidf_topk",         # fixed-point tf·N/df keyword extraction
    "text_chunk_overlap",      # map-side sliding-window RAG chunking
    "stream_dedup_keys",       # streaming dropDuplicates, deterministic key set
    "graph_sssp_bounded",      # bounded Bellman-Ford hops, |E|-bounded rounds
    "agg_mad_outliers",        # robust location/scale + outlier counts, one shuffle
    "set_union",               # O4 — restored r4 (VERDICT r3 #1), green r4
    "dedup_minhash_lsh",       # content-addressed materialization (r4), green r4
    "dedup_ngram_jaccard",     # adaptive df-cap rewrite (r4), green r4
    "dedup_embedding_cosine",  # adaptive cold/hot tiling rewrite (r4), green r4
    "dedup_simhash",           # signature path shared with Hamming variant
    "pipeline_corpus_curation",  # composes the adaptive dedup guards
    "win_session_batch",       # events reader rewrite confirmed green r4
    "win_tumbling_hourly",     # events reader rewrite confirmed green r4
    # ---- position 51+: multiply-confirmed driver-green, rotated out ----
    # r4-green extras rotated out in r5 (not SURVEY §2 rows; local parity
    # keeps checking them every round):
    "stream_tumbling_hourly",  # green r4 (win_tumbling_hourly covers T1 in-window)
    "dedup_simhash_hamming",   # green r4
    "graph_triangle_count",    # green r4 (copurchase projection keeps the family)
    "join_time_range",         # green r4
    "split_train_holdout",     # green r4
    "sample_domain_mix",       # green r4 (temperature mix keeps the family)
    "sample_stratified_exact", # green r4
    "text_token_budget",       # green r4
    "profile_table_stats",     # green r4
    "agg_histogram",           # green r4 (equi-depth variant keeps the family)
    "agg_winsorize",           # green r4
    "sim_ann_recall_contract", # green r4 (sim_ann_ivf_trained re-proves the pattern)
    "agg_approx_distinct",     # green r4
    "win_asof_last_click",     # green r4
    "agg_rollup",              # green r4
    "agg_pivot",               # green r4
    "agg_cube",                # green r4
    "win_rank_frames",         # green r4
    "graph_connected_components",  # green r4
    "text_repetition_ratio",   # green r4
    "text_decontaminate",      # green r4
    "agg_approx_quantiles",    # green r4
    # ---- SURVEY-declared rows driver-green in r1-r3 (ROTATED_OUT) ----
    "src_csv_scan",            # S1 — driver-green r3
    "src_json_flatten",        # S2 — driver-green r2-r3
    "sink_upsert_node",        # S4 — driver-green r1-r3
    "sink_upsert_edge",        # S5 — driver-green r3
    "sink_merge_prefer_nonempty",  # S6 — driver-green r1-r3
    "graph_count_by_label",    # S9 — driver-green r1-r3
    "proj_select_alias",       # P1 — driver-green r1-r3
    "flt_compound_predicate",  # P2+P3 — driver-green r1-r3
    "flt_blocklist_predicate", # P4+F9 — driver-green r1-r3
    "fn_hash_uid",             # F1 — driver-green r1-r3
    "fn_dict_normalize",       # F2-F4 — driver-green r1-r3
    "fn_regexp_extract_all",   # F5 — driver-green r1-r3
    "fn_timestamps",           # F8 — driver-green r1-r3
    "fn_code_parse",           # F10 — driver-green r1-r3
    "fn_case_classify",        # D3 — driver-green r1-r3
    "dedup_exact",             # D1 — driver-green r1-r3
    "dedup_merge_most_complete",  # D2 — driver-green r1-r3
    "dedup_docs_exact",        # D5 — driver-green r1-r3
    "sim_cosine_topk",         # D5 — driver-green r1-r3
    "join_broadcast_inner",    # J1 — driver-green r1-r3
    "join_left_anti",          # J2 — driver-green r1-r3
    "join_left_semi",          # J3 — driver-green r1-r3
    "join_two_hop",            # J4 — driver-green r1-r3
    "join_consistency_antijoin",  # J7 — driver-green r1-r3
    "graph_reachability",      # J6 — driver-green r1-r3
    "agg_count_by_label",      # A1 — driver-green r1-r3
    "agg_global_count",        # A2 — driver-green r1-r3
    "agg_group_topn",          # A3 — driver-green r1-r3
    "agg_topk",                # A4 — driver-green r1-r3
    "agg_multi_counter",       # A5 — driver-green r1-r3
    "agg_collect_set",         # A6 — driver-green r1-r3
    "sort_limit",              # O1+O2 — driver-green r1-r3
    "win_row_number_dedup",    # O3 — driver-green r2-r3
    "win_lag_running_sum",     # O5 — driver-green r2-r3
    "explode_split_targets",   # X2 — driver-green r1-r3
    "arr_contains_lookup",     # X3 — driver-green r1-r3
    "text_lang_id",            # driver-green r2-r3
    "text_quality_score",      # driver-green r2-r3
    "text_token_count",        # driver-green r2-r3
    "text_fingerprint",        # driver-green r2-r3
    "mm_binary_features",      # driver-green r2-r3
    "mm_metadata_struct",      # driver-green r3
    "mm_image_decode",         # driver-green r3
    # ---- extras already driver-green in r1/r2 ----
    "graph_pattern_match",     # J4 shape — driver-green r1
    "dedup_minhash_signatures",  # subsumed by dedup_minhash_lsh — green r1
    "graph_degree_distribution",  # driver-green r1
    "set_intersect_except",    # O4 sibling — driver-green r1
    "agg_salted_skew",         # driver-green r2
    "mm_frame_sample",         # driver-green r2
    "graph_orphan_antijoin",   # driver-green r1
]

# SURVEY-declared rows rotated out of the driver window after earning green
# driver CORRECTNESS rows in earlier rounds (round noted above). Each stays
# oracle-checked locally every round; test_library asserts the partition.
ROTATED_OUT = {
    "src_csv_scan", "src_json_flatten", "sink_upsert_node", "sink_upsert_edge",
    "sink_merge_prefer_nonempty", "graph_count_by_label", "proj_select_alias",
    "flt_compound_predicate", "flt_blocklist_predicate", "fn_hash_uid",
    "fn_dict_normalize", "fn_regexp_extract_all", "fn_timestamps",
    "fn_code_parse", "fn_case_classify", "dedup_exact",
    "dedup_merge_most_complete", "dedup_docs_exact", "sim_cosine_topk",
    "join_broadcast_inner", "join_left_anti", "join_left_semi", "join_two_hop",
    "join_consistency_antijoin", "graph_reachability", "agg_count_by_label",
    "agg_global_count", "agg_group_topn", "agg_topk", "agg_multi_counter",
    "agg_collect_set", "sort_limit", "win_row_number_dedup",
    "win_lag_running_sum", "explode_split_targets", "arr_contains_lookup",
    "text_lang_id", "text_quality_score", "text_token_count",
    "text_fingerprint", "mm_binary_features", "mm_metadata_struct",
    "mm_image_decode",
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
