"""Unit tests for the skew and multimodal operator libraries."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.operators.multimodal import (
    _HAS_PIL,
    decode_image,
    sample_frames,
)
from graph_etl_pipeline_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = table(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    plain = (
        li.join(p, "l_partkey")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(li, p, "l_partkey", salt_buckets=4)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_decode_stub_gated():
    if _HAS_PIL:
        pytest.skip("PIL available — decode is real here")
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_image(b"\x89PNG...")


def test_sample_frames_edges():
    assert sample_frames(b"", 4, 8) == []
    frames = sample_frames(b"abcdefgh", 4, 2)
    assert frames == [b"ab", b"cd", b"ef", b"gh"]
    # blob shorter than n_frames*stride: stride clamps to 1
    frames = sample_frames(b"ab", 4, 2)
    assert frames[0] == b"ab" and len(frames) == 2


def test_hot_shingle_df_cap_kills_quadratic_pairs(spark, tmp_path):
    """VERDICT r2 #5: a shingle shared by more docs than MAX_SHINGLE_DF is
    corpus boilerplate — it must be dropped BEFORE the inverted-index
    self-join so one hot shingle can't create a quadratic candidate set.
    Planted corpus: 60 docs share one 5-gram (df=60 > cap=50) and are
    otherwise unique → without the cap the join would emit C(60,2)=1770
    intersecting pairs; with it, zero. A genuine near-dup pair built from
    RARE shingles must still be detected (the cap is signal-neutral)."""
    from graph_etl_pipeline_spark.queries.dedup import MAX_SHINGLE_DF, dedup_ngram_jaccard

    n_hot = MAX_SHINGLE_DF + 10
    rows = [
        # "common boiler plate legal footer" is the single shared 5-gram;
        # every other 5-gram window contains a doc-unique token.
        (i, f"common boiler plate legal footer u{i} v{i} w{i} x{i} y{i}")
        for i in range(n_hot)
    ]
    # positive control: 8-token base (4 rare shingles) + 1 extra token in
    # doc 101 (5 shingles) → jaccard 4/5 = 0.8 ≥ 0.5
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows += [(100_000, base), (100_001, base + " iota")]
    sf = str(tmp_path / "planted")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )

    out = dedup_ngram_jaccard(spark, sf)
    pairs = out.collect()
    assert len(pairs) == 1, f"expected only the rare-shingle pair, got {pairs}"
    (p,) = pairs
    assert (p.doc_a, p.doc_b) == (100_000, 100_001)
    assert abs(p.jaccard - 0.8) < 1e-12
    # engaged-guard plan shape: the cap must be a broadcast anti-join,
    # never a window over the exploded index (r3 regression shape)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_repetition_fold_matches_counter(spark):
    """Property check for the sorted-run fold: for random token lists the
    max equal-run in the sorted array must equal the max token frequency
    (python Counter ground truth). One Spark job over 200 generated docs."""
    import random
    from collections import Counter

    rng = random.Random(42)
    vocab = ["a", "b", "c", "aa", "zz", ""]
    docs = [
        [rng.choice(vocab) for _ in range(rng.randint(1, 40))] for _ in range(200)
    ]
    expected = [max(Counter(d).values()) for d in docs]

    from graph_etl_pipeline_spark.queries import textops  # noqa: F401  (fold lives inline)

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "i long, toks array<string>"
    )
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = (
            F.when(x.eqNullSafe(acc.getField("prev")), acc.getField("run") + 1)
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
        )

    got = {
        r.i: r.top
        for r in df.select(
            "i",
            F.aggregate(
                F.array_sort("toks"), zero, step, lambda a: a.getField("best")
            ).alias("top"),
        ).collect()
    }
    assert got == {i: e for i, e in enumerate(expected)}


def test_materialize_content_addressing(spark, tmp_path):
    """materialize() reuses a completed scratch dir for the SAME plan over
    the SAME inputs, but must NOT collide across different input files:
    the analyzed-plan string renders parquet relations without their
    paths, so the digest keys the input file list explicitly (regression:
    sf0.001 results were served for a sf0.01 query)."""
    import os

    from graph_etl_pipeline_spark.io import SCRATCH_DIR, materialize

    p1, p2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    spark.createDataFrame([(1,)], "x long").write.parquet(p1)
    spark.createDataFrame([(2,)], "x long").write.parquet(p2)

    before = {d for d in os.listdir(SCRATCH_DIR)} if os.path.isdir(SCRATCH_DIR) else set()
    m1 = materialize(spark.read.parquet(p1).select(F.col("x") * 10), "ca_test")
    m2 = materialize(spark.read.parquet(p2).select(F.col("x") * 10), "ca_test")
    assert [r[0] for r in m1.collect()] == [10]
    assert [r[0] for r in m2.collect()] == [20]  # no cross-input reuse
    created = {d for d in os.listdir(SCRATCH_DIR) if d.startswith("ca_test")} - before
    assert len(created) == 2  # distinct digests

    # identical plan + input a second time: no third dir (reuse hit)
    materialize(spark.read.parquet(p1).select(F.col("x") * 10), "ca_test")
    again = {d for d in os.listdir(SCRATCH_DIR) if d.startswith("ca_test")} - before
    assert again == created


def test_simhash_hamming_exact_dup_distance_zero(spark, tmp_path):
    """Planted corpus: two byte-identical docs must surface as a
    Hamming-0 pair via the band join; an unrelated doc must not pair
    with them within distance 2 (48 random-ish bits apart)."""
    from graph_etl_pipeline_spark.queries.dedup import dedup_simhash_hamming

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different subject matter about parquet row groups and shuffles"),
    ]
    sf = str(tmp_path / "planted")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup_simhash_hamming(spark, sf).collect()}
    assert pairs.get((1, 2)) == 0
    assert all(k == (1, 2) for k in pairs), pairs


def test_pii_scrub_planted_corpus(spark, tmp_path):
    """Redaction must replace every email/phone occurrence with its typed
    placeholder, count them, and leave clean text untouched. Email pass
    runs FIRST (contract): digit-bearing email local parts must come out
    as <EMAIL>, never <PHONE>."""
    from graph_etl_pipeline_spark.queries.textops import text_pii_scrub

    rows = [
        (1, "contact jane.doe99@example.org or call +49 (0)30 1234-5678 now"),
        (2, "two mails: a@b.io c@d.museum"),
        (3, "no pii here at all"),
    ]
    sf = str(tmp_path / "pii")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    out = {r.doc_id: r for r in text_pii_scrub(spark, sf).collect()}
    assert out[1].n_emails == 1 and out[1].n_phones == 1
    assert "<EMAIL>" in out[1].clean_text and "<PHONE>" in out[1].clean_text
    assert "jane" not in out[1].clean_text and "5678" not in out[1].clean_text
    assert out[2].n_emails == 2 and out[2].clean_text == "two mails: <EMAIL> <EMAIL>"
    assert out[3].clean_text == "no pii here at all"
    assert (out[3].n_emails, out[3].n_phones) == (0, 0)
