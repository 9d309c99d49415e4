"""Empty-input robustness: a representative operator from each family must
run (and return an empty, correctly-typed result) when its input tables
have zero rows — the degenerate case every scheduled pipeline eventually
hits (an empty partition day, a filter that matched nothing) and where
null-handling bugs (max(ts) = NULL arithmetic, divisions by zero counts)
live. Streaming fixture-builders and seeded-centroid queries legitimately
require non-empty input and are out of scope by design."""

from __future__ import annotations

import os

import pytest

from graph_etl_pipeline_spark.io import TABLES, table
from graph_etl_pipeline_spark.registry import all_queries

# One per family; all are pure batch plans with no fixture writes and no
# first-K seed requirement.
EMPTY_SAFE = [
    "proj_select_alias",
    "flt_compound_predicate",
    "dedup_exact",
    "join_broadcast_inner",
    "join_two_hop",
    "agg_multi_counter",
    "agg_bitmap_exact_distinct",
    "agg_markov_transitions",
    "win_lag_running_sum",
    "win_running_distinct",
    "win_max_drawdown",
    "win_rolling_range_1h",
    "text_token_count",
    "text_gopher_rules",
    "text_html_strip",
    "dedup_ngram_spans",
    "text_winnowing_fingerprint",
    "sample_upsample_epochs",
    "privacy_kanonymity_audit",
    "join_scd2_asof",
    "graph_degree_distribution",
    "src_jsonl_scan",
    "join_asof_tolerance",
    "privacy_l_diversity_audit",
    "agg_autocorr_lag1",
    "dedup_incremental_lsh",
    "dedup_band_bucket_stats",
    "win_interval_union_length",
    "privacy_t_closeness_audit",
    "win_rolling_median_exact",
    "sample_poisson_bootstrap",
    "sink_manifest_atomic_swap",
    "dq_merkle_checksum",
    "sample_preference_pairs",
    "sample_weighted_priority",
    "geo_grid_nn_join",
    "dq_benford_audit",
    "sink_dynamic_partition_overwrite",
    "src_multiline_log_scan",
    "pipeline_antientropy_repair",
    "graph_harmonic_centrality",
    "win_attribution_multitouch",
    "graph_closeness_sampled",
    "win_cusum_alarm",
    "agg_weighted_median",
    "text_pack_tokenized",
    "embed_matryoshka_prefix",
    "cdc_tombstone_compaction",
    "agg_hdr_histogram",
    "geo_bbox_contains_join",
    "sample_class_balance",
    "graph_betweenness_stress_sampled",
    "graph_hyperanf_sketch",
    "graph_neighborhood_function",
    "pipeline_minhash_verified_dedup",
    "graph_effective_diameter",
    "embed_centroid_drift",
    "agg_hdr_shard_merge",
    "text_token_drift",
    "stream_partitioned_sink_merge",
    "sample_preference_pairs_decontaminated",
    "pipeline_dpo_dataset",
    "dq_eval_overlap_audit",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    """A scale-factor directory with every table present but EMPTY,
    schema-identical to the real testdata."""
    root = tmp_path_factory.mktemp("sf_empty")
    src = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
    for name in TABLES:
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_runs_empty_and_returns_zero_rows(spark, empty_sf_dir, name):
    df = all_queries()[name].fn(spark, empty_sf_dir)
    assert df.columns, name
    assert df.count() == 0, name


def test_empty_dir_tables_read_with_schema(spark, empty_sf_dir):
    for name in ("events", "documents", "lineitem"):
        df = table(spark, empty_sf_dir, name)
        assert df.count() == 0
        assert df.schema.fields
