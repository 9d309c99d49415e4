"""Scale-behavior smoke: amplify the provided inputs 10× (self-union with
shifted keys) and check (a) the plans complete at 6M lineitem rows on the
test box, (b) exact-decimal aggregates scale EXACTLY — the revenue of 10
copies is precisely 10× one copy, which only holds because sums are
decimal (double summation would drift with partitioning)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.numeric import dec
from graph_etl_pipeline_spark.io import table

AMP = 10


def _amplified_lineitem(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    copies = [
        li.withColumn("l_orderkey", li.l_orderkey + F.lit(i * 10_000_000))
        for i in range(AMP)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01"])
def test_decimal_aggregates_scale_exactly(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    one = li.agg(F.sum(rev).alias("r")).collect()[0]["r"]
    amplified = _amplified_lineitem(spark, sf_dir)
    ten = amplified.agg(F.sum(rev).alias("r")).collect()[0]["r"]
    assert ten == one * AMP  # exact Decimal equality, any partitioning
    assert amplified.count() == li.count() * AMP


def test_flagship_shape_survives_amplification(spark):
    """The flagship joins/aggregates 6M amplified rows; per-region revenue
    must be exactly 10× the unamplified run (same join fan-out because
    amplified orderkeys join nothing extra — they reuse the base orders
    table via modulo-mapping back)."""
    sf_dir = "/root/testdata/sf0.01"
    li = _amplified_lineitem(spark, sf_dir).withColumn(
        "l_orderkey", F.col("l_orderkey") % 10_000_000
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region")
    from graph_etl_pipeline_spark.queries.joins import _revenue_col

    amplified = (
        li.select("l_orderkey", _revenue_col(li))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum("rev").alias("revenue"))
    )
    from graph_etl_pipeline_spark.queries.joins import join_four_hop_chain

    base = {
        row["r_name"]: row["revenue"]
        for row in join_four_hop_chain(spark, sf_dir).collect()
    }
    got = {row["r_name"]: row["revenue"] for row in amplified.collect()}
    assert set(got) == set(base)
    for k in base:
        # base revenue comes back as double (query output); compare to
        # the exact decimal amplified sum at double precision
        assert got[k] is not None
        assert float(got[k]) == pytest.approx(base[k] * AMP, rel=1e-12)


def test_incremental_crossmodal_components_invariant_under_amplification(
    spark, tmp_path
):
    """Clone-amplify the corpus AMP_CM× (shifted doc_ids ≡ same residue
    mod the ingest split, identical texts/embeddings) and require the
    incremental cross-modal closure to keep EXACTLY as many documents as
    the base run. Why that is the scale invariant: pair generation
    depends only on CONTENT (band signatures, frozen cells — seeds and
    Lloyd means are multiplicity-uniform, so the trained cells match),
    so the amplified pair graph is the base graph with every vertex
    expanded into an all-pairs clone clique — every base component
    (and every base singleton) becomes ONE amplified component. A kept
    count that moved would mean some stage (LSH candidates, τ verify,
    label contraction, CC) silently depends on ids or partitioning
    rather than content — exactly the class of bug that only shows at
    scale-up."""
    from graph_etl_pipeline_spark.queries.composite import (
        pipeline_incremental_crossmodal,
    )

    AMP_CM = 3  # shift stride 10_000_000 ≡ 0 (mod 5): cohort preserved
    base_sf = "/root/testdata/sf0.001"
    sf = str(tmp_path)
    for name, key in (("documents", "doc_id"), ("embeddings", "vec_id")):
        t = table(spark, base_sf, name)
        copies = [
            t.withColumn(key, F.col(key) + F.lit(i * 10_000_000))
            for i in range(AMP_CM)
        ]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{sf}/{name}.parquet")

    base = pipeline_incremental_crossmodal(spark, base_sf)
    amp = pipeline_incremental_crossmodal(spark, sf)
    base_rows = base.count()
    base_kept = base.filter("kept").count()
    amp_rows = amp.count()
    amp_kept = amp.filter("kept").count()
    assert amp_rows == AMP_CM * base_rows
    assert amp_kept == base_kept  # components invariant under cloning
    assert base_kept < base_rows  # non-vacuous: dup clusters exist at sf0.001
