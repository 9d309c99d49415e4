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
