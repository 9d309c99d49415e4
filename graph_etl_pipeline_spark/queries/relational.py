"""Projection / filter / scalar-function / sort / set operators
(SURVEY.md §2.2 P1-P5, §2.3 F1-F10, §2.7 O1-O4, §2.8 X2-X3).

These re-express the reference's row-at-a-time Python cleaning logic
(src/etl/waste_items.py) as whole-stage-codegen JVM expressions — no
Python UDFs anywhere in this module. Filters and projections sit directly
on the parquet scan so Catalyst pushes them into the reader (PushedFilters
+ pruned ReadSchema), which is the difference between scanning 100 TB and
scanning the 2 columns × matching row-groups you actually need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.hashing import uid_hash
from graph_etl_pipeline_spark.functions.numeric import dec, dsum
from graph_etl_pipeline_spark.io import table
from graph_etl_pipeline_spark.queries._sql import osum, sdec
from graph_etl_pipeline_spark.registry import register

# Substring blocklist, engine analogue of the reference's 16-pattern note
# detector (src/etl/waste_items.py:72-120 is_valid_facility_name).
BLOCKLIST = ("slow", "error", "drop", "spill", "skew")


@register(
    "proj_select_alias",
    oracle="""
    SELECT c_custkey AS cust_id, c_name AS cust_name, c_mktsegment AS segment
    FROM customer
    """,
    tags=("projection",),
)
def proj_select_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: projection with renames, dropping unused columns (reference:
    src/etl/waste_items.py:269-279 — Abfallart→name, drops address/hours/
    contact). Column pruning reaches the parquet reader."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        c.c_custkey.alias("cust_id"),
        c.c_name.alias("cust_name"),
        c.c_mktsegment.alias("segment"),
    )


@register(
    "flt_compound_predicate",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE NOT (regexp_matches(trim(lang), '^[a-z]{2}$') AND n_chars < 200)
      AND trim(source) <> ''
    """,
    tags=("filter",),
)
def flt_compound_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2+P3: compound row filter (reference: src/etl/waste_items.py:240-248
    — drop section-marker rows where name is a single letter AND target is
    empty; :269-271 — drop blank names). Same shape: regex + length +
    emptiness under a negated conjunction."""
    d = table(spark, sf_dir, "documents")
    section_marker = F.trim(d.lang).rlike("^[a-z]{2}$") & (d.n_chars < 200)
    return d.select("doc_id", "lang", "source", "n_chars").filter(
        ~section_marker & (F.trim(d.source) != "")
    )


@register(
    "flt_blocklist_predicate",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE length(trim(text)) >= 3
      AND NOT ({" OR ".join(f"contains(lower(text), '{p}')" for p in BLOCKLIST)})
    """,
    tags=("filter",),
)
def flt_blocklist_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: blocklist validity predicate (reference: src/etl/waste_items.py:72-120
    — rejects strings shorter than 3 chars or containing any of 16 note
    patterns). The blocklist is a literal array probed with a higher-order
    `exists` — one codegen'd expression, no join, no UDF."""
    d = table(spark, sf_dir, "documents")
    patterns = F.array(*[F.lit(p) for p in BLOCKLIST])
    has_blocked = F.exists(patterns, lambda p: F.instr(F.lower(d.text), p) > 0)
    return d.filter((F.length(F.trim(d.text)) >= 3) & ~has_blocked).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "fn_hash_uid",
    oracle="""
    SELECT c_custkey, substr(sha256(c_name), 1, 16) AS uid
    FROM customer
    """,
    tags=("function",),
)
def fn_hash_uid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: deterministic surrogate uid = sha256(name)[:16] (reference:
    src/etl/waste_items.py:61-63, src/etl/facilities.py:36-38). Stable
    across runs and engines — the key property the reference relies on for
    idempotent MERGE."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", uid_hash("c_name").alias("uid"))


# 12-entry canonicalization map, analogue of FACILITY_NAME_MAP
# (reference: src/etl/waste_items.py:45-58 — typo/synonym normalization).
SEGMENT_MAP = {
    "AUTOMOBILE": "auto",
    "BUILDING": "construction",
    "FURNITURE": "home",
    "HOUSEHOLD": "home",
    "MACHINERY": "industrial",
}


@register(
    "fn_dict_normalize",
    oracle=f"""
    SELECT CASE trim(c_mktsegment)
           {" ".join(f"WHEN '{k}' THEN '{v}'" for k, v in SEGMENT_MAP.items())}
           ELSE trim(c_mktsegment) END AS segment_norm,
           COUNT(*) AS n
    FROM customer
    GROUP BY 1
    """,
    tags=("function",),
)
def fn_dict_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2+F3: dictionary normalization after trim (reference:
    src/etl/waste_items.py:45-58,66-69 — normalize_facility_name). At
    scale this is a broadcast join against the literal mapping (O(1) per
    row, never shuffles the fact side); a left join + coalesce keeps
    unmapped names as-is."""
    c = table(spark, sf_dir, "customer")
    mapping = F.broadcast(
        spark.createDataFrame(list(SEGMENT_MAP.items()), "raw string, canonical string")
    )
    trimmed = c.select(F.trim(c.c_mktsegment).alias("raw"))
    return (
        trimmed.join(mapping, "raw", "left")
        .select(F.coalesce("canonical", "raw").alias("segment_norm"))
        .groupBy("segment_norm")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "fn_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           COALESCE(array_to_string(regexp_extract_all(text, '(scan|join|merge|sort)', 1), ','), '') AS ops_csv,
           len(regexp_extract_all(text, '(scan|join|merge|sort)', 1)) AS n_ops
    FROM documents
    """,
    tags=("function", "regex"),
)
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: multi-pattern extraction of ALL matches (reference:
    src/etl/waste_items.py:174-237 — 40 ordered regex patterns pulled out
    of concatenated facility strings, longest-first). Alternation ordered
    longest-first reproduces the match-and-remove loop when patterns don't
    nest; one vectorized regexp_extract_all replaces the Python loop."""
    d = table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all(d.text, F.lit("(scan|join|merge|sort)"), 1)
    return d.select(
        "doc_id",
        F.concat_ws(",", matches).alias("ops_csv"),
        F.size(matches).alias("n_ops"),
    )


@register(
    "explode_split_targets",
    oracle=f"""
    SELECT token, COUNT(*) AS n_docs
    FROM (
        SELECT DISTINCT doc_id, token
        FROM (
            SELECT doc_id, trim(unnest(string_split(text, ' '))) AS token
            FROM documents
        )
        WHERE length(token) > 3
          AND NOT ({" OR ".join(f"token = '{p}'" for p in BLOCKLIST)})
    )
    GROUP BY token
    """,
    tags=("explode", "function"),
)
def explode_split_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2+F6+F7+D1: the reference's full target-expansion pipeline
    (src/etl/waste_items.py:123-171 parse_disposal_targets — split the
    multi-valued cell, trim, validate against the blocklist, dedup, then
    expand 1→N). Higher-order array functions (transform → filter →
    array_distinct) run inside codegen; explode only materializes the
    surviving targets."""
    d = table(spark, sf_dir, "documents")
    tokens = F.array_distinct(
        F.filter(
            F.transform(F.split(d.text, " "), lambda t: F.trim(t)),
            lambda t: (F.length(t) > 3) & ~t.isin(*BLOCKLIST),
        )
    )
    return (
        d.select("doc_id", F.explode(tokens).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "fn_case_classify",
    oracle="""
    SELECT CASE WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
                ELSE 'engagement' END AS kind,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1
    """,
    tags=("function",),
)
def fn_case_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: set-membership routing (reference: src/etl/waste_items.py:35-41,
    284-299 — classify_target: name ∈ WASTE_STREAMS → stream else
    facility). A when/otherwise over isin — branch-free codegen."""
    ev = table(spark, sf_dir, "events")
    kind = (
        F.when(ev.event_type.isin("purchase", "signup"), "conversion")
        .otherwise("engagement")
        .alias("kind")
    )
    return ev.groupBy(kind).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "total_value"),
    )


@register(
    "fn_timestamps",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders,
           {osum(sdec('o_totalprice'), "total_revenue")}
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("function", "timestamp"),
)
def fn_timestamps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: timestamp derivations (reference: src/etl/waste_items.py:370-372
    — datetime() stamping; deterministic stand-in per SURVEY §2.3: calendar
    extraction on o_orderdate, since current_timestamp can't be
    value-hashed)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year(o.o_orderdate).alias("order_year"),
            F.month(o.o_orderdate).alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_revenue"),
        )
    )


@register(
    "fn_code_parse",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS modifier,
           string_split(p_name, ' ')[-1] AS category,
           len(string_split(p_name, ' ')) AS n_words,
           contains(p_type, 'PROMO') AS is_promo,
           TRY_CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num
    FROM part
    """,
    tags=("function",),
)
def fn_code_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: structured-code parsing (reference: schema.cql:26-57,122 +
    Schema_Doku.pdf §6 — AVV code: hazard flag from trailing '*', level
    from digit-pair count, parent by truncation). Same derivations over
    part: hierarchy pieces from p_name tokens, flag from p_type, numeric
    key extracted from p_brand."""
    p = table(spark, sf_dir, "part")
    words = F.split(p.p_name, " ")
    return p.select(
        "p_partkey",
        F.element_at(words, 1).alias("modifier"),
        F.element_at(words, -1).alias("category"),
        F.size(words).alias("n_words"),
        p.p_type.contains("PROMO").alias("is_promo"),
        F.regexp_extract(p.p_brand, r"#(\d+)", 1).cast("int").alias("brand_num"),
    )


@register(
    "arr_contains_lookup",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE list_contains(string_split(p_name, ' '), 'widget')
    """,
    tags=("array",),
)
def arr_contains_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: array-membership lookup (reference: schema.cql:20 — synonyms
    list + index; Schema_Doku.pdf §6 — comma-string → list). Search via
    array_contains on the derived token array."""
    p = table(spark, sf_dir, "part")
    return p.select("p_partkey", "p_name").filter(
        F.array_contains(F.split(p.p_name, " "), "widget")
    )


@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("sort",),
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: order-by + limit (reference: etl_implementation.md:235,251,
    256 — ORDER BY count DESC LIMIT 10/20 sample queries). Deterministic
    tie-break on the key; planned as TakeOrderedAndProject, never a global
    sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "set_union",
    oracle="""
    SELECT c_name AS name, 'customer' AS kind FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS kind FROM supplier
    """,
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: union of record streams (reference: src/etl/facilities.py:59-66
    — all uuid-groups flattened into one stream; waste_items.py:377-419 —
    streams + facilities both become disposal targets). unionByName keeps
    schema alignment explicit."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"), F.lit("customer").alias("kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@register(
    "set_intersect_except",
    oracle="""
    SELECT p_brand, 'both' AS membership FROM (
        SELECT DISTINCT p_brand FROM part WHERE p_type = 'PROMO'
        INTERSECT
        SELECT DISTINCT p_brand FROM part WHERE p_type = 'ECONOMY'
    )
    UNION ALL
    SELECT p_brand, 'promo_only' AS membership FROM (
        SELECT DISTINCT p_brand FROM part WHERE p_type = 'PROMO'
        EXCEPT
        SELECT DISTINCT p_brand FROM part WHERE p_type = 'ECONOMY'
    )
    """,
    tags=("setop",),
)
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops beyond union (SURVEY §2.7 notes intersect/except "come free"
    — claimed here so the claim is checked): brands sold as both PROMO and
    ECONOMY vs PROMO-only."""
    p = table(spark, sf_dir, "part")
    promo = p.filter(p.p_type == "PROMO").select("p_brand").distinct()
    econ = p.filter(p.p_type == "ECONOMY").select("p_brand").distinct()
    both = promo.intersect(econ).select("p_brand", F.lit("both").alias("membership"))
    only = promo.exceptAll(econ).select("p_brand", F.lit("promo_only").alias("membership"))
    return both.unionByName(only)


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


@register(
    "profile_table_stats",
    oracle=" UNION ALL ".join(
        f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows, "
        f"COUNT({c}) AS n_non_null, COUNT(DISTINCT {c}) AS n_distinct "
        f"FROM documents"
        for c in _PROFILE_COLS
    ),
    tags=("profile", "api"),
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling — the data-quality verb every ingest pipeline runs
    before trusting a new source (reference analogue: the row-count /
    validity stats waste_items.py prints after each import, generalized
    to per-column completeness + cardinality).

    ONE scan for all columns: a single aggregate computes rows /
    non-nulls / distincts for every column (Spark plans the multiple
    COUNT(DISTINCT)s via one Expand — still a single pass over the
    table, factor-of-columns rows into a map-combined agg, no join of
    per-column jobs), then stack() unpivots the 1-row result into the
    (column_name, n_rows, n_non_null, n_distinct) report. At 100 TB the
    expand factor is the knob: profile column GROUPS in batches if the
    5x row inflation ever outweighs re-scanning."""
    return profile_columns(table(spark, sf_dir, "documents"), _PROFILE_COLS)


def profile_columns(df: DataFrame, cols: tuple[str, ...] | None = None) -> DataFrame:
    """One-pass per-column profile of any DataFrame (library form, also
    exposed as the CLI ``profile`` verb). See profile_table_stats for the
    plan shape and the 100 TB batching note."""
    cols = cols or tuple(df.columns)
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(c).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', {c}__rows, {c}__nn, {c}__nd" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) "
        "AS (column_name, n_rows, n_non_null, n_distinct)"
    )
