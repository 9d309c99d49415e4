"""Deduplication / entity-resolution operators (SURVEY.md §2.4 D1-D2) —
the reference's core competency, re-expressed set-orientedly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.registry import register


@register(
    "dedup_exact",
    oracle="""
    SELECT text, MIN(doc_id) AS first_doc_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
    tags=("dedup",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: exact dedup (reference: src/etl/waste_items.py:171 —
    list(set(targets))). Formulated as min-per-group instead of
    dropDuplicates so the surviving representative is deterministic —
    dropDuplicates keeps an arbitrary row, which is a hidden
    nondeterminism at any scale."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("first_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "dedup_merge_most_complete",
    oracle="""
    WITH sparse AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 3 = 0 THEN '' ELSE lang END AS lang_s
        FROM documents
    )
    SELECT source,
           min_by(lang_s, doc_id) FILTER (WHERE lang_s <> '') AS first_lang,
           COUNT(*) AS n_records,
           CAST(SUM(CASE WHEN lang_s <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled
    FROM sparse
    GROUP BY source
    """,
    tags=("dedup", "er"),
)
def dedup_merge_most_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: group-dedup keeping the most complete record (reference:
    src/etl/facilities.py:59-76 — first entry wins, later entries fill
    only empty fields). The reference's "first" is implicit file order;
    the engine makes the ordering column explicit (doc_id — SURVEY §7
    risk list) and uses min_by with an emptiness filter: the earliest
    non-empty value per group wins, exactly the prefer-non-empty fill."""
    d = table(spark, sf_dir, "documents")
    sparse = d.select(
        "doc_id",
        "source",
        F.when(d.doc_id % 3 == 0, "").otherwise(d.lang).alias("lang_s"),
    )
    return sparse.groupBy("source").agg(
        F.expr("min_by(lang_s, doc_id) FILTER (WHERE lang_s <> '')").alias("first_lang"),
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.when(F.col("lang_s") != "", 1).otherwise(0)).alias("n_filled"),
    )


@register(
    "dedup_docs_exact",
    oracle=r"""
    WITH fps AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM documents
    )
    SELECT fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM fps
    GROUP BY fp
    """,
    tags=("dedup", "llm"),
)
def dedup_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: corpus-scale exact dedup on a normalized fingerprint
    (lowercase, trim, collapse whitespace → md5). At 100 TB the groupBy
    shuffles 16-byte digests, never document bodies — the standard
    first pass of an LLM data pipeline, upstream of MinHash."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(d.text)), r"\s+", " ")).alias("fp")
    return (
        d.select("doc_id", fp)
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


FUZZY_MAX_DIST = 2  # edit-distance threshold for a fuzzy name match


@register(
    "dedup_fuzzy_names",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    blocked AS (SELECT name, split_part(name, ' ', -1) AS blk FROM names)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INTEGER) AS edit_dist
    FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {FUZZY_MAX_DIST}
    """,
    tags=("dedup", "er"),
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: token-blocked candidate generation +
    Levenshtein verification. The discovery-side complement of the
    reference's FACILITY_NAME_MAP (reference src/etl/waste_items.py:45-58),
    which normalizes only the typo variants someone already found by
    hand — this query FINDS the near-miss name pairs.

    Scale shape: never an all-pairs comparison. Candidates must share a
    blocking key (the LAST token of the name — part names vary most in
    their leading tokens, so the tail token blocks best; both the Spark
    side and the oracle index from the end); the equi-join on the block
    key shuffles names once, and edit distance runs only inside blocks.
    At corpus scale hot blocks get the same treatment as hot shingles in
    dedup_ngram_jaccard (frequency cap + broadcast anti-join — see
    queries/dedup.py MAX_SHINGLE_DF); the test vocabulary's largest block
    is 8 names, so the cap machinery is not engaged here."""
    p = table(spark, sf_dir, "part")
    names = p.select(F.col("p_name").alias("name")).distinct()
    blocked = names.withColumn("blk", F.element_at(F.split("name", " "), -1))
    a, b = blocked.alias("a"), blocked.alias("b")
    dist = F.levenshtein(F.col("a.name"), F.col("b.name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.name") < F.col("b.name")),
        )
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            dist.cast("int").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_DIST)
    )
