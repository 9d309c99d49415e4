"""Embedding similarity search (SURVEY.md §2.4 D5 / driver north-star:
"similarity search" over embeddings.embedding array<float>).

Numeric design: dot products and norms are computed in DECIMAL(18,9) —
float elements cast losslessly-deterministically (no scale-9 tie exists
for a binary float), products/sums exact and order-independent — then ONE
double conversion at the end. Cosines are therefore bit-identical across
Spark, DuckDB, and any partitioning/cluster size. At 100 TB this is also
the audit story: a resharded cluster reproduces identical scores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import register

DIM = 64
DEC = "decimal(18,9)"
# Accumulator keeps 7 integer digits: |element| < 1 so |dot| ≤ DIM — each
# (25,18)+(37,18) add lands exactly at (38,18) and the downcast back to
# (25,18) is lossless. Never rounds, stays inside Spark's 38-digit cap.
ACC = "decimal(25,18)"
QUERY_VEC_ID = 0
PAIR_THRESHOLD = 0.4  # testdata has no planted embedding dups; 0.4 yields real pairs


def _dot(a: Column, b: Column) -> Column:
    """Exact decimal dot product of two float arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double").cast(DEC) * y.cast("double").cast(DEC))
    return F.aggregate(prods, F.lit(0).cast(ACC), lambda acc, v: (acc + v).cast(ACC))


def _sql_dot(a: str, b: str) -> str:
    return (
        f"SUM(CAST(CAST({a}[i] AS DOUBLE) AS DECIMAL(18,9)) * CAST(CAST({b}[i] AS DOUBLE) AS DECIMAL(18,9)))"
    )


def _as_double(c: Column) -> Column:
    return c.cast("double")


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    dots AS (
        SELECT e.vec_id, e.label,
               {_sql_dot("e.embedding", "q.qe")} AS dot_d,
               {_sql_dot("e.embedding", "e.embedding")} AS na_d,
               {_sql_dot("q.qe", "q.qe")} AS nq_d
        FROM embeddings e, q, generate_series(1, {DIM}) AS t(i)
        WHERE e.vec_id <> {QUERY_VEC_ID}
        GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label,
           CAST(CAST(dot_d AS VARCHAR) AS DOUBLE)
           / (sqrt(CAST(CAST(na_d AS VARCHAR) AS DOUBLE))
              * sqrt(CAST(CAST(nq_d AS VARCHAR) AS DOUBLE))) AS cosine
    FROM dots
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "llm"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — the exact baseline every ANN variant is
    measured against. One scan, no shuffle until the final top-k
    (TakeOrderedAndProject); the query vector is a broadcast (1 row)."""
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(e.vec_id == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    )
    joined = e.filter(e.vec_id != QUERY_VEC_ID).crossJoin(q)
    dot = _as_double(_dot(F.col("embedding"), F.col("qe")))
    na = _as_double(_dot(F.col("embedding"), F.col("embedding")))
    nq = _as_double(_dot(F.col("qe"), F.col("qe")))
    cosine = (dot / (F.sqrt(na) * F.sqrt(nq))).alias("cosine")
    return (
        joined.select("vec_id", "label", cosine)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
               {_sql_dot("a.embedding", "b.embedding")} AS dot_d,
               {_sql_dot("a.embedding", "a.embedding")} AS na_d,
               {_sql_dot("b.embedding", "b.embedding")} AS nb_d
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id,
        generate_series(1, {DIM}) AS t(i)
        GROUP BY a.vec_id, b.vec_id, a.label
    )
    SELECT vec_a, vec_b, label,
           CAST(CAST(dot_d AS VARCHAR) AS DOUBLE)
           / (sqrt(CAST(CAST(na_d AS VARCHAR) AS DOUBLE))
              * sqrt(CAST(CAST(nb_d AS VARCHAR) AS DOUBLE))) AS cosine
    FROM dots
    WHERE CAST(CAST(dot_d AS VARCHAR) AS DOUBLE)
          / (sqrt(CAST(CAST(na_d AS VARCHAR) AS DOUBLE))
             * sqrt(CAST(CAST(nb_d AS VARCHAR) AS DOUBLE))) >= {PAIR_THRESHOLD}
    """,
    tags=("dedup", "similarity", "llm"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, BLOCKED by the cluster label so the
    pair join is per-block instead of n² (the label column stands in for
    an IVF/LSH bucket assignment — at 100 TB the block key comes from
    sim_ann_ivf's coarse quantizer)."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    dot = _as_double(_dot(F.col("a.embedding"), F.col("b.embedding")))
    na = _as_double(_dot(F.col("a.embedding"), F.col("a.embedding")))
    nb = _as_double(_dot(F.col("b.embedding"), F.col("b.embedding")))
    cosine = dot / (F.sqrt(na) * F.sqrt(nb))
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            cosine.alias("cosine"),
        )
        .filter(F.col("cosine") >= PAIR_THRESHOLD)
    )


@register(
    "sim_ann_ivf",
    oracle=None,  # approximate by construction; recall vs the exact
    # baseline is asserted in tests/test_similarity.py
    tags=("similarity", "llm", "approx"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor: coarse quantize (centroid
    per label = exact decimal mean), probe the nearest `nprobe` cells,
    exact-rank only within the probed cells. At scale: centroids are a
    broadcast table (k × dim floats), the fact table is partitioned by
    cell id, and each query touches nprobe partitions instead of all."""
    e = table(spark, sf_dir, "embeddings")
    # centroids: exact decimal mean per label, one row per (label, dim-slot)
    pos = e.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "x")
    )
    centroids = (
        pos.groupBy("label", "i")
        .agg((F.sum(F.col("x").cast(DEC)) / F.count(F.lit(1))).cast("double").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p.getField("c")).alias("centroid"))
    )
    q = F.broadcast(
        e.filter(e.vec_id == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    )
    # nearest cell by cosine(query, centroid); nprobe=2
    cdist = centroids.crossJoin(q).select(
        "label",
        (
            _as_double(_dot_f(F.col("centroid"), F.col("qe")))
            / (
                F.sqrt(_as_double(_dot_f(F.col("centroid"), F.col("centroid"))))
                * F.sqrt(_as_double(_dot_f(F.col("qe"), F.col("qe"))))
            )
        ).alias("ccos"),
    )
    probed = F.broadcast(cdist.orderBy(F.desc("ccos"), F.asc("label")).limit(2).select("label"))
    cands = e.join(probed, "label").filter(e.vec_id != QUERY_VEC_ID).crossJoin(q)
    dot = _as_double(_dot(F.col("embedding"), F.col("qe")))
    na = _as_double(_dot(F.col("embedding"), F.col("embedding")))
    nq = _as_double(_dot(F.col("qe"), F.col("qe")))
    cosine = (dot / (F.sqrt(na) * F.sqrt(nq))).alias("cosine")
    return (
        cands.select("vec_id", "label", cosine)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


def _dot_f(a: Column, b: Column) -> Column:
    """Dot product for double arrays (centroids) — already exact-derived."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double").cast(DEC) * y.cast("double").cast(DEC))
    return F.aggregate(prods, F.lit(0).cast(ACC), lambda acc, v: (acc + v).cast(ACC))
