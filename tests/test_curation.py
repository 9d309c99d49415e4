"""Curation operators: plan-shape guarantees (map-side policies must not
shuffle; rank-based policies pay exactly one exchange) and the selection
invariants the oracles can't express directly (budget maximality, exact
stratum counts, split stability)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph_etl_pipeline_spark.queries.curation import (
    STRATIFIED_FRACTION,
    TOKEN_BUDGET,
)
from graph_etl_pipeline_spark.registry import all_queries

from tests.conftest import SF_ORACLE


def _plan(spark, name, sf_dir) -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_hash_policies_never_hash_shuffle(spark, sf_dir):
    """split and domain-mix are per-row verdicts: no hashpartitioning
    exchange may appear (the only allowed exchange is the round-robin
    parallelism floor the documents reader adds for single-row-group
    test files)."""
    for name in ("split_train_holdout", "sample_domain_mix"):
        plan = _plan(spark, name, sf_dir)
        assert "hashpartitioning" not in plan, name
        assert "SortMergeJoin" not in plan, name


def test_rank_policies_pay_exactly_one_exchange(spark, sf_dir):
    """Stratified sampling's two windows share a partition key, so the
    plan must contain exactly ONE hash exchange; same for the token
    budget's single running-sum window."""
    for name, key in (
        ("sample_stratified_exact", "lang"),
        ("text_token_budget", "source"),
    ):
        plan = _plan(spark, name, sf_dir)
        hits = [
            ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
        ]
        assert len(hits) == 1, f"{name}: {hits}"
        assert key in hits[0], f"{name}: exchange not keyed on {key}: {hits[0]}"


def test_split_partitions_corpus_near_ratio(spark):
    q = all_queries()["split_train_holdout"].fn(spark, SF_ORACLE)
    counts = {r["split"]: r["n"] for r in q.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    assert total == docs  # every document lands in exactly one split
    # 230/256 ≈ 89.8% expected; allow sampling noise at 500 docs
    assert 0.84 <= counts["train"] / total <= 0.95


def test_split_is_rerun_stable(spark):
    a = {r["doc_id"]: r["split"] for r in all_queries()["split_train_holdout"].fn(spark, SF_ORACLE).collect()}
    b = {r["doc_id"]: r["split"] for r in all_queries()["split_train_holdout"].fn(spark, SF_ORACLE).collect()}
    assert a == b


def test_stratified_counts_are_exact(spark):
    sampled = all_queries()["sample_stratified_exact"].fn(spark, SF_ORACLE)
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {
        r["lang"]: r["n"]
        for r in spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {
        lang: math.ceil(STRATIFIED_FRACTION * n) for lang, n in full.items()
    }


def test_token_budget_maximal_greedy(spark):
    """Each source's selection must (a) never exceed the budget and
    (b) be maximal: the first rejected document would not have fit."""
    rows = all_queries()["text_token_budget"].fn(spark, SF_ORACLE).collect()
    by_src: dict[str, int] = {}
    for r in rows:
        assert r["cum_tok"] <= TOKEN_BUDGET
        by_src[r["source"]] = max(by_src.get(r["source"], 0), r["cum_tok"])
    # recompute the full running sums to find each source's first reject
    from graph_etl_pipeline_spark.functions.text import norm_tokens
    from pyspark.sql import Window

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.select(
        "source",
        F.sum(F.size(norm_tokens(d.text))).over(w).alias("cum_tok"),
    )
    first_reject = {
        r["source"]: r["m"]
        for r in cum.filter(F.col("cum_tok") > TOKEN_BUDGET)
        .groupBy("source")
        .agg(F.min("cum_tok").alias("m"))
        .collect()
    }
    for src, kept_max in by_src.items():
        if src in first_reject:
            assert first_reject[src] > TOKEN_BUDGET >= kept_max


def test_weighted_sample_count_and_heavy_doc_guarantee(spark, sf_dir):
    """Systematic token-weighted sampling selects exactly
    total_tokens // stride documents (the boundary at offset 0 is not
    claimable — selection needs a multiple of the stride strictly inside
    (offset, offset+n]) (one per stride of corpus
    mass), and any document at least one stride long is always kept."""
    from graph_etl_pipeline_spark.queries.curation import (
        SAMPLE_STRIDE,
        sample_weighted_tokens,
    )
    from graph_etl_pipeline_spark.functions.text import norm_tokens
    from graph_etl_pipeline_spark.io import table

    picked = sample_weighted_tokens(spark, sf_dir)
    n_picked = picked.count()
    total = (
        table(spark, sf_dir, "documents")
        .select(F.sum(F.size(norm_tokens(F.col("text")))).alias("t"))
        .collect()[0]["t"]
    )
    assert n_picked == total // SAMPLE_STRIDE
    # every doc spanning >= stride tokens crosses a boundary by pigeonhole
    heavy = picked.filter(F.col("n_tokens") >= SAMPLE_STRIDE).count()
    all_heavy = (
        table(spark, sf_dir, "documents")
        .filter(F.size(norm_tokens(F.col("text"))) >= SAMPLE_STRIDE)
        .count()
    )
    assert heavy == all_heavy


def test_reservoir_bottomk_plan_and_nesting(spark):
    """Bottom-k sampling must compile to TakeOrderedAndProject (per-task
    heap + driver merge — no global sort exchange), read only the three
    projected columns, and produce nested samples: the bottom-32 by the
    same draw is a strict prefix of the registered bottom-64."""
    from graph_etl_pipeline_spark.queries.curation import (
        RESERVOIR_K,
        sample_reservoir_bottomk,
    )

    df = sample_reservoir_bottomk(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # heap merge happens at the driver, not a sort shuffle

    rows = df.collect()
    assert len(rows) == RESERVOIR_K
    draws = [r["draw"] for r in rows]
    assert draws == sorted(draws) or set(draws) == set(sorted(draws))
    # nested-sample property: bottom-32 == first 32 of bottom-64 by (draw, doc_id)
    ordered = sorted(rows, key=lambda r: (r["draw"], r["doc_id"]))
    half = (
        sample_reservoir_bottomk(spark, SF_ORACLE)
        .orderBy("draw", "doc_id")
        .limit(RESERVOIR_K // 2)
        .collect()
    )
    assert [(r["draw"], r["doc_id"]) for r in ordered[: RESERVOIR_K // 2]] == [
        (r["draw"], r["doc_id"]) for r in half
    ]
