"""Embedding similarity search (SURVEY.md §2.4 D5 / driver north-star:
"similarity search" over embeddings.embedding array<float>).

Numeric design: dot products are strict LEFT FOLDS over the array
(Spark `aggregate` and DuckDB `list_reduce` are both sequential), and
float elements are widened to double (exact) before multiplying — so both
engines execute the identical IEEE operation sequence and produce
bit-identical cosines. Array order is part of the data, not the
partitioning, so results are also stable across cluster sizes.
Norms are computed ONCE per vector and joined to pairs — never recomputed
per pair (at 100 TB the norm table is a cheap side input; recomputing
norms per candidate pair multiplies the flop count by the average
candidate degree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import register

DIM = 64
QUERY_VEC_ID = 0
PAIR_THRESHOLD = 0.4  # testdata has no planted embedding dups; 0.4 yields real pairs
CHUNK_CAP = 32  # max vectors per triangle-join tile side (bounds task size to CAP²;
# small enough that every test SF exceeds one chunk, so the tiling path is
# always the one under test — at real scale tune toward 1-10k)


def _dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product in doubles — deterministic and
    engine-portable (see module docstring)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"[CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {DIM})]), (acc, v) -> acc + v)"
    )


_SQL_NORMS = f"""
    norms AS (
        SELECT vec_id, label, embedding,
               sqrt({_sql_dot("embedding", "embedding")}) AS nrm
        FROM embeddings
    )
"""


def _norms(e: DataFrame) -> DataFrame:
    return e.select(
        "vec_id", "label", "embedding", F.sqrt(_dot("embedding", "embedding")).alias("nrm")
    )


@register(
    "sim_cosine_topk",
    oracle=f"""
    WITH {_SQL_NORMS},
    q AS (SELECT embedding AS qe, nrm AS qnrm FROM norms WHERE vec_id = {QUERY_VEC_ID})
    SELECT e.vec_id, e.label,
           {_sql_dot("e.embedding", "q.qe")} / (e.nrm * q.qnrm) AS cosine
    FROM norms e, q
    WHERE e.vec_id <> {QUERY_VEC_ID}
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
    tags=("similarity", "llm"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k — the exact baseline every ANN variant is
    measured against. One scan, no shuffle until the final top-k
    (TakeOrderedAndProject); the query vector is a broadcast (1 row)."""
    e = _norms(table(spark, sf_dir, "embeddings"))
    q = F.broadcast(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
            F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")
        )
    )
    joined = e.filter(F.col("vec_id") != QUERY_VEC_ID).crossJoin(q)
    cosine = (_dot("embedding", "qe") / (F.col("nrm") * F.col("qnrm"))).alias("cosine")
    return (
        joined.select("vec_id", "label", cosine)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH {_SQL_NORMS}
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           {_sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cosine
    FROM norms a JOIN norms b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_sql_dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= {PAIR_THRESHOLD}
    """,
    tags=("dedup", "similarity", "llm"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, BLOCKED by the cluster label so the
    pair join is per-block instead of n² (the label column stands in for
    an IVF/LSH bucket assignment — at 100 TB the block key comes from
    sim_ann_ivf's coarse quantizer). One fused dot per pair; norms come
    precomputed from the per-vector side input.

    Straggler control (VERDICT r1 #5): within a block the all-pairs join
    is TRIANGLE-TILED — vectors are chunked into runs of ≤ CHUNK_CAP by
    vec_id order, and the join shuffles on (label, tile_i, tile_j), so a
    block of n vectors becomes (n/CAP)² independent tiles of ≤ CAP² pair
    candidates each instead of one n² task. The emitted pair set is
    IDENTICAL to the naive per-label self-join (each (a,b) pair lands in
    exactly one tile: (chunk_a, chunk_b)); only the work distribution
    changes. Replication cost: each row is shipped to ~nchunks/2 tiles —
    linear in block size, vs the quadratic straggler it removes."""
    from pyspark.sql import Window

    e = _norms(table(spark, sf_dir, "embeddings"))
    w = Window.partitionBy("label").orderBy("vec_id")
    chunked = e.withColumn(
        "chunk", ((F.row_number().over(w) - F.lit(1)) / F.lit(CHUNK_CAP)).cast("int")
    )
    # One row per label — broadcast side input for the tile fan-out.
    max_chunks = F.broadcast(chunked.groupBy("label").agg(F.max("chunk").alias("max_chunk")))
    # A pair (a, b) with vec_id_a < vec_id_b has chunk_a <= chunk_b (chunks
    # follow vec_id order). Left fans out to tiles (chunk, j) for j >= chunk;
    # right to tiles (i, chunk) for i <= chunk; they meet exactly once, at
    # tile (chunk_a, chunk_b).
    left = (
        chunked.join(max_chunks, "label")
        .withColumn("tile_j", F.explode(F.sequence(F.col("chunk"), F.col("max_chunk"))))
        .select(
            "label", "vec_id", "embedding", "nrm",
            F.col("chunk").alias("tile_i"), "tile_j",
        )
    )
    right = chunked.withColumn(
        "tile_i", F.explode(F.sequence(F.lit(0), F.col("chunk")))
    ).select(
        "label", "vec_id", "embedding", "nrm",
        "tile_i", F.col("chunk").alias("tile_j"),
    )
    pairs = left.alias("a").join(right.alias("b"), ["label", "tile_i", "tile_j"]).filter(
        F.col("a.vec_id") < F.col("b.vec_id")
    )
    cosine = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("label"),
        cosine.alias("cosine"),
    ).filter(F.col("cosine") >= PAIR_THRESHOLD)


@register(
    "sim_ann_ivf",
    oracle=None,  # approximate by construction; recall vs the exact
    # baseline is asserted in tests/test_library.py::test_ann_ivf_recall
    tags=("similarity", "llm", "approx"),
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor: coarse quantize (centroid
    per label = mean vector), probe the nearest `nprobe` cells, exact-rank
    only within the probed cells. At scale: centroids are a broadcast
    table (k × dim doubles), the fact table is partitioned by cell id, and
    each query touches nprobe partitions instead of all of them."""
    e = table(spark, sf_dir, "embeddings")
    pos = e.select("label", F.posexplode(F.col("embedding")).alias("i", "x"))
    centroids = (
        pos.groupBy("label", "i")
        .agg((F.sum(F.col("x").cast("double")) / F.count(F.lit(1))).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p.getField("c")).alias("centroid"))
    )
    q = F.broadcast(
        e.filter(e.vec_id == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    )
    cdist = centroids.crossJoin(q).select(
        "label",
        (
            _dot("centroid", "qe")
            / (F.sqrt(_dot("centroid", "centroid")) * F.sqrt(_dot("qe", "qe")))
        ).alias("ccos"),
    )
    probed = F.broadcast(cdist.orderBy(F.desc("ccos"), F.asc("label")).limit(2).select("label"))
    cands = _norms(e.join(probed, "label").filter(e.vec_id != QUERY_VEC_ID)).crossJoin(
        F.broadcast(
            _norms(e.filter(e.vec_id == QUERY_VEC_ID)).select(
                F.col("embedding").alias("qe"), F.col("nrm").alias("qnrm")
            )
        )
    )
    cosine = (_dot("embedding", "qe") / (F.col("nrm") * F.col("qnrm"))).alias("cosine")
    return (
        cands.select("vec_id", "label", cosine)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )
