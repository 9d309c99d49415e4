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
# tests/test_oracle_parity.py); the r3-added operators take their slots.
# Names not listed here (future additions) append at the end in registration
# order. tests/test_library.py asserts the invariants.
CORE_ORDER = [
    # -- r3-added operators, promoted for their first hard driver row --
    "win_asof_last_click",     # as-of join via fill-forward window
    "agg_rollup",              # hierarchical subtotals, one exchange
    "graph_connected_components",  # iterative hash-min CC vs closed-form oracle
    "text_repetition_ratio",   # Gopher-style repetition quality signal
    "text_decontaminate",      # benchmark 8-gram contamination flag
    "text_pack_sequences",     # two-level prefix-sum sequence packing
    "agg_approx_quantiles",    # quantile-sketch accuracy contract
    "stream_incremental_upsert",  # T2 foreachBatch merge (real streaming)
    "sim_ann_recall_contract", # in-query ANN recall floor, hash-checkable
    "set_union",               # O4 — restored (demoted r3 for mm_image_decode)
    # -- r2-promoted rows keeping their hard coverage --
    "src_json_flatten",        # S2
    "win_row_number_dedup",    # O3
    "win_lag_running_sum",     # O5
    "win_tumbling_hourly",     # T1 (batch-checkable form)
    "win_session_batch",       # T4
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    # -- previously-green SURVEY core --
    "join_four_hop_chain",     # J5 (flagship)
    "join_broadcast_inner",    # J1
    "join_left_anti",          # J2
    "join_left_semi",          # J3
    "join_two_hop",            # J4
    "join_consistency_antijoin",  # J7
    "agg_count_by_label",      # A1
    "agg_group_topn",          # A3
    "agg_multi_counter",       # A5
    "agg_collect_set",         # A6
    "dedup_exact",             # D1
    "dedup_merge_most_complete",  # D2
    "dedup_docs_exact",        # D5
    "pipeline_corpus_curation",
    "dedup_minhash_lsh",       # D5 near-dup
    "dedup_ngram_jaccard",     # D5 near-dup
    "dedup_simhash",           # D5 sibling — promoted r4 (Hamming-k upgrade)
    "graph_count_by_label",    # S9
    "graph_reachability",      # J6
    "mm_binary_features",
    "flt_compound_predicate",  # P2+P3
    "flt_blocklist_predicate", # P4+F9
    "fn_dict_normalize",       # F2-F4
    "fn_regexp_extract_all",   # F5
    "explode_split_targets",   # X2 (P5+F6+F7)
    "fn_case_classify",        # D3
    "fn_code_parse",           # F10
    "mm_image_decode",         # real BMP codec round-trip
    "sim_cosine_topk",
    "dedup_embedding_cosine",
    "dedup_simhash_hamming",   # Hamming<=2 band-pigeonhole neighbors (r4)
    # ---- position 51+: driver-green in r1-r3, rotated out (ROTATED_OUT);
    # ---- then extras, best-evidence first ----
    "sink_upsert_node",        # S4 — driver-green r1-r3
    "sink_merge_prefer_nonempty",  # S6 — driver-green r1-r3
    "sink_upsert_edge",        # S5 — driver-green r3
    "src_csv_scan",            # S1 — driver-green r3
    "proj_select_alias",       # P1 — driver-green r1-r3
    "fn_hash_uid",             # F1 — driver-green r1-r3
    "fn_timestamps",           # F8 — driver-green r1-r3
    "arr_contains_lookup",     # X3 — driver-green r1-r3
    "sort_limit",              # O1+O2 — driver-green r1-r3
    "agg_global_count",        # A2 — driver-green r1-r3
    "agg_topk",                # A4 — driver-green r1-r3
    "mm_metadata_struct",      # driver-green r3
    "graph_pattern_match",     # J4 covered by join_two_hop
    "agg_pivot",
    "dedup_minhash_signatures",  # subsumed by dedup_minhash_lsh
    "graph_degree_distribution",
    "set_intersect_except",    # O4 covered by set_union
    "agg_salted_skew",
    "mm_frame_sample",
    "graph_orphan_antijoin",   # anti-join covered by J2/J7
    "stream_tumbling_hourly",  # T1 hard row via win_tumbling_hourly; streaming≡batch tested
    "win_rank_frames",         # window extra beyond O3/O5
    "agg_approx_distinct",     # exact-count + in-query accuracy contract
    "sim_ann_ivf",             # approximate by construction
    "text_pii_scrub",          # typed-placeholder redaction + audit counts (r4)
    "profile_table_stats",     # one-pass per-column completeness/cardinality (r4)
    "split_train_holdout",     # deterministic hash split, map-side (r4)
    "sample_domain_mix",       # per-domain hash-threshold mixing, map-side (r4)
    "sample_stratified_exact", # exact per-stratum fraction, one exchange (r4)
    "text_token_budget",       # per-source greedy token budget, one exchange (r4)
    "join_time_range",         # interval join via bucketed equi-join (r4)
    "graph_triangle_count",    # degree-oriented triangle join (r4)
    "dedup_cluster_keep",      # LSH pairs → CC → canonical retention (r4)
    "agg_heavy_hitters",       # Misra-Gries sketch + exact contract (r4)
    "stream_stateful_running", # applyInPandasWithState running totals (r4)
    "agg_cube",                # all-grouping-sets cross-tab, one exchange (r4)
    "dq_expectations",         # declarative ingest-gate audit rows (r4)
    "cdc_snapshot_diff",       # snapshot diff → insert/update/delete rows (r4)
    "scd2_history",            # type-2 validity intervals, one exchange (r4)
    "win_funnel_conversion",   # 3-stage funnel, one shuffle via chained windows (r4)
    "sample_weighted_tokens",  # integer systematic length-weighted sampling (r4)
    "embed_quantize_int8",     # map-side symmetric int8 vector quantization (r4)
    "agg_winsorize",           # P05/P95 clamp + winsorized mean, one shuffle (r4)
    "graph_pagerank",          # fixed-point int64 PageRank, 3 Pregel rounds (r4)
    "text_tfidf_topk",         # fixed-point tf·N/df keyword extraction (r4)
    "text_chunk_overlap",      # map-side sliding-window RAG chunking (r4)
    "stream_dedup_keys",       # streaming dropDuplicates, deterministic key set (r4)
    "agg_histogram",           # fixed-width distribution profile, one exchange (r4)
    "graph_sssp_bounded",      # bounded Bellman-Ford hops, |E|-bounded rounds (r4)
    "agg_mad_outliers",        # robust location/scale + outlier counts, one shuffle (r4)
]

# SURVEY-declared rows rotated out of the driver window after earning green
# driver CORRECTNESS rows in earlier rounds (round noted above). Each stays
# oracle-checked locally every round; test_library asserts the partition.
ROTATED_OUT = {
    "sink_upsert_node", "sink_merge_prefer_nonempty", "sink_upsert_edge",
    "src_csv_scan", "proj_select_alias", "fn_hash_uid", "fn_timestamps",
    "arr_contains_lookup", "sort_limit", "agg_global_count", "agg_topk",
    "mm_metadata_struct",
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
