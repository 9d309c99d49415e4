"""Composite / wide-shape queries: pivot, degree distribution, and the
end-to-end corpus-curation pipeline that chains the LLM operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.text import SQL_TOKS, norm_tokens, sql_shingles
from graph_etl_pipeline_spark.queries.dedup import (
    MAX_SHINGLE_DF,
    _jaccard_pairs,
    _rare_shingle_index,
)
from graph_etl_pipeline_spark.graph.build import star_graph
from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "agg_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
    tags=("agg", "pivot"),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix. The pivot value list is
    EXPLICIT — without it Spark runs an extra distinct-collection job and
    the output schema depends on the data, both wrong at scale."""
    ev = table(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in EVENT_TYPES],
    )


@register(
    "graph_degree_distribution",
    oracle="""
    WITH degrees AS (
        SELECT o_custkey AS uid, COUNT(*) AS degree
        FROM orders GROUP BY o_custkey
    )
    SELECT degree, COUNT(*) AS n_nodes
    FROM degrees
    GROUP BY degree
    """,
    tags=("graph", "agg"),
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram over the PLACED_BY edges — the first diagnostic on
    any production graph (skew detection: a hot vertex shows up as an
    extreme-degree outlier, which is exactly what the salted-join path
    exists for). Two small aggregations; the shuffle carries one row per
    vertex then one per distinct degree."""
    g = star_graph(spark, sf_dir)
    degrees = (
        g.edges.filter(F.col("rel_type") == "PLACED_BY")
        .groupBy(F.col("dst_uid").alias("uid"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return degrees.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))


_TOKS = SQL_TOKS.format(col="text")

_CURATION_SQL = f"""
    WITH fps AS (
        SELECT doc_id, text,
               md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    ),
    exact_kept AS (  -- exact dedup: first doc per fingerprint survives
        SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
            FROM fps
        ) WHERE rn = 1
    ),
    toks AS (
        SELECT doc_id, {_TOKS} AS t FROM exact_kept
    ),
    sh_all AS (
        SELECT doc_id, unnest({sql_shingles("t", k=5)}) AS s
        FROM toks
    ),
    hot AS (  -- df-capped stop-shingles (see queries.dedup.MAX_SHINGLE_DF)
        SELECT s FROM sh_all GROUP BY s HAVING COUNT(*) > {MAX_SHINGLE_DF}
    ),
    sh AS (
        SELECT doc_id, s FROM sh_all WHERE s NOT IN (SELECT s FROM hot)
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    near_dup_losers AS (  -- later doc of any >=0.5-Jaccard pair drops
        SELECT DISTINCT doc_b AS doc_id
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5
    ),
    curated AS (
        SELECT k.doc_id, len({SQL_TOKS.format(col="k.text")}) AS n_tokens
        FROM exact_kept k
        WHERE k.doc_id NOT IN (SELECT doc_id FROM near_dup_losers)
          AND len({SQL_TOKS.format(col="k.text")}) >= 20
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM curated
"""


@register("pipeline_corpus_curation", oracle=_CURATION_SQL, tags=("llm", "pipeline"))
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation — the LLM-pipeline operators
    composed the way a real data pipeline chains them:
    exact dedup (normalized fingerprint, earliest doc survives)
    → near-dup removal (5-gram Jaccard ≥ 0.5, later doc of a pair drops)
    → quality floor (≥ 20 tokens)
    → corpus statistics.
    Every stage is shuffle-bounded (16-byte fingerprints, inverted-index
    shingle join, per-doc token counts). The exploded shingle table is
    materialized once (write-then-read, io.materialize) because it feeds
    both join sides plus the size lookup; up to that boundary and after
    it, the chain is lazy and Catalyst prunes columns stage to stage."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(d.text)), r"\s+", " ")).alias("fp")
    w = Window.partitionBy("fp").orderBy("doc_id")
    exact_kept = (
        d.select("doc_id", "text", fp)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )

    from graph_etl_pipeline_spark.functions.text import shingles

    # df-capped inverted shingle index off a materialized array table;
    # the cap is a broadcast anti-join against the tiny hot-shingle list
    # (see dedup._rare_shingle_index / _jaccard_pairs)
    ds, sizes = _rare_shingle_index(
        exact_kept.select(
            "doc_id", shingles(norm_tokens(F.col("text")), k=5).alias("shingles")
        ),
        "curation_rare",
    )
    losers = (
        _jaccard_pairs(ds, sizes)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )

    curated = (
        exact_kept.join(losers, "doc_id", "left_anti")
        .select("doc_id", F.size(norm_tokens(F.col("text"))).alias("n_tokens"))
        .filter(F.col("n_tokens") >= 20)
    )
    return curated.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
