"""Behavioral contracts for the round-6 fourth wave, beyond oracle parity:
the bloom prefilter must actually filter (and never drop a true match),
SemDeDup's greedy keep must preserve one representative per cluster, the
upsampler's achieved rate must track its factor, and duplicated-span
coverage must hit 1000 permille on a fully-duplicated document.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def test_bloom_prefilter_filters_without_false_negatives(spark):
    """The broadcast bitmap must pass EVERY true match (no false
    negatives — guaranteed by construction, asserted anyway) while
    rejecting most non-matching probe rows (the point of the filter)."""
    from graph_etl_pipeline_spark.queries.joins import (
        BLOOM_PRIORITIES,
        BLOOM_SEEDS,
        _bloom_probe,
    )

    orders = table(spark, SF_SMOKE, "orders")
    build_keys = orders.filter(
        F.col("o_orderpriority").isin(*BLOOM_PRIORITIES)
    ).select("o_orderkey")
    li = table(spark, SF_SMOKE, "lineitem").select("l_orderkey")

    from graph_etl_pipeline_spark.queries.joins import bloom_bitmap

    bf = bloom_bitmap(build_keys, "o_orderkey")
    probed = li.join(F.broadcast(bf)).withColumn(
        "hit",
        _bloom_probe(F.col("l_orderkey"), BLOOM_SEEDS[0])
        & _bloom_probe(F.col("l_orderkey"), BLOOM_SEEDS[1])
        & _bloom_probe(F.col("l_orderkey"), BLOOM_SEEDS[2]),
    )
    true_matches = li.join(build_keys, li.l_orderkey == build_keys.o_orderkey)
    n_li = li.count()
    n_true = true_matches.count()
    n_hit = probed.filter("hit").count()
    # no false negatives: every true match survives the prefilter
    missed = (
        true_matches.select("l_orderkey")
        .join(probed.filter("hit").select("l_orderkey"), "l_orderkey", "left_anti")
        .count()
    )
    assert missed == 0
    # and the filter actually filters: survivors are close to the true
    # match set, far below the full probe side (priorities cut ~3/5)
    assert n_true <= n_hit < n_li * 0.6
    # false-positive mass stays small at this build-side load factor
    assert n_hit - n_true <= max(10, n_li // 100)


def test_semdedup_keeps_cluster_minimum_and_engages(spark):
    """Greedy lower-id drop means the minimum vec_id of every cluster has
    no lower-id pair — it must always be kept — and at the shipped τ the
    operator must actually drop something on the test corpus."""
    df = all_queries()["dedup_semdedup_clusters"].fn(spark, SF_SMOKE).cache()
    dropped = df.filter(~F.col("keep")).count()
    assert dropped > 0
    min_kept = (
        df.groupBy("cluster")
        .agg(F.min(F.struct("vec_id", "keep")).alias("m"))
        .select(F.col("m.keep").alias("keep"))
        .filter(~F.col("keep"))
        .count()
    )
    assert min_kept == 0
    df.unpersist()


def test_upsample_achieved_rate_tracks_factor(spark):
    """Fractional upsampling must emit ≥ floor(f) copies per doc and land
    the per-source achieved rate within 200 permille of the target at
    smoke scale (25 docs/source ⇒ ±1 copy granularity is 40 permille)."""
    df = all_queries()["sample_upsample_epochs"].fn(spark, SF_SMOKE)
    rows = df.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_emitted >= (r.factor_permille // 1000) * r.n_docs
        assert abs(r.achieved_permille - r.factor_permille) <= 200


def test_ngram_spans_full_duplicate_scores_1000(spark):
    """A document whose every span is shared with another doc must score
    exactly 1000 permille; the corpus ships at least one such pair."""
    df = all_queries()["dedup_ngram_spans"].fn(spark, SF_SMOKE)
    full = df.filter((F.col("n_spans") > 0) & (F.col("dup_permille") == 1000))
    assert full.count() > 0
    # permille is bounded and exact
    bad = df.filter((F.col("dup_permille") < 0) | (F.col("dup_permille") > 1000))
    assert bad.count() == 0


def test_bitmap_distinct_matches_builtin(spark):
    """The chunked bitmap must equal Spark's own countDistinct."""
    got = {
        r.l_returnflag: (r.n_distinct_orders, r.n_rows)
        for r in all_queries()["agg_bitmap_exact_distinct"].fn(spark, SF_SMOKE).collect()
    }
    li = table(spark, SF_SMOKE, "lineitem")
    want = {
        r.l_returnflag: (r.nd, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got == want
