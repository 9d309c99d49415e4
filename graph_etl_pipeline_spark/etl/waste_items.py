"""Waste-item ETL — the reference's flagship pipeline (reference:
src/etl/waste_items.py, 481 LoC of row-at-a-time Python), re-expressed as
ONE declarative Spark plan per phase.

Reference lifecycle (SURVEY.md §3.2): CSV → section-marker filter → target
expansion (split / length-branch / regex-extract / validate / normalize /
dedup) → classify (stream vs facility) → per-row Cypher MERGE (~1,600
bolt round-trips). Engine lifecycle: the same semantics as set operations
— the write phase is two set-oriented merges (nodes, edges) regardless of
row count, so the same code handles 548 items or 548 billion.

Domain vocabulary (stream names, facility canonicalization, note-pattern
blocklist) is configuration, not code: defaults below reproduce the
reference's behavior on its fixture cases (FIXTURES.md §A1); deployments
pass their own.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.functions.hashing import uid_hash
from graph_etl_pipeline_spark.sinks.upsert import merge_upsert, upsert_edges


@dataclass(frozen=True)
class WasteItemConfig:
    """Domain constants (reference: src/etl/waste_items.py:35-58,72-120)."""

    # The 5 canonical disposal streams (reference :35-41).
    streams: tuple[str, ...] = (
        "Restabfalltonne",
        "Biotonne",
        "Altpapiertonne",
        "Verpackungstonne",
        "Verpackungstonne (Gelbe Tonne)",
    )
    # Canonicalization map: typos, tab pollution, synonyms (reference :45-58).
    name_map: tuple[tuple[str, str], ...] = (
        ("Restmülltonne", "Restabfalltonne"),
        ("Gelbe Tonne", "Verpackungstonne (Gelbe Tonne)"),
        ("Fachhandel / Herstelle", "Fachhandel / Hersteller"),
        ("Abfallumladeanlage \tFES", "Abfallumladeanlage FES"),
    )
    # Substring blocklist marking notes rather than facility names
    # (reference :72-120: 'laut ', 'hinweis', ' = ', 'stück', ...).
    blocklist: tuple[str, ...] = (
        "laut ", "hinweis", " = ", "stück", "siehe", "z.b.", "bzw",
        "entsorgung", "abholung", "termin", "gebühr", "kostenlos",
        "angebot", "anfrage", "auskunft", "beachten",
    )
    # Note-prefixes (reference :113-114).
    note_prefixes: tuple[str, ...] = ("laut", "ab ", "bis ", "lauut")
    # Known multi-word facility names for concat extraction (reference
    # :174-237 keeps 40 ordered patterns; longest-first is load-bearing).
    known_facilities: tuple[str, ...] = (
        "Wertstoffhof Nord", "Wertstoffhof West", "Wertstoffhof Ost",
        "Schadstoffsammlung", "Abfallumladeanlage FES",
        "Fachhandel / Hersteller", "Sperrmüll Express",
    )
    min_len: int = 3
    concat_threshold: int = 30  # length-branch (reference :154-169)


DEFAULT_CONFIG = WasteItemConfig()


def _is_section_marker(name: F.Column, targets: F.Column) -> F.Column:
    """Index rows like 'A' / 'B' with no targets (reference :240-248)."""
    t = F.trim(name)
    return (F.length(t) == 1) & t.rlike("^[A-Za-z]$") & (F.trim(targets) == "")


def _is_valid_name(c: F.Column, cfg: WasteItemConfig) -> F.Column:
    """P4 blocklist validity predicate (reference :72-120): length floor,
    substring blocklist, note prefixes, ' oder ' alternatives."""
    lower = F.lower(c)
    blocked = F.exists(
        F.array(*[F.lit(p) for p in cfg.blocklist]),
        lambda p: F.instr(lower, p) > 0,
    )
    prefixed = F.exists(
        F.array(*[F.lit(p) for p in cfg.note_prefixes]),
        lambda p: lower.startswith(p),
    )
    return (
        (F.length(c) >= cfg.min_len)
        & ~blocked
        & ~prefixed
        & ~lower.contains(" oder ")
    )


def _normalize(c: F.Column, cfg: WasteItemConfig) -> F.Column:
    """F2 dictionary normalization after trim (reference :45-58,66-69).
    Inlined when() chain — the mapping is a handful of entries; the
    broadcast-join variant for big dictionaries is fn_dict_normalize."""
    out = F.trim(c)
    expr = None
    for raw, canonical in cfg.name_map:
        cond = out == raw
        expr = F.when(cond, canonical) if expr is None else expr.when(cond, canonical)
    return expr.otherwise(out) if expr is not None else out


def _extract_known(c: F.Column, cfg: WasteItemConfig) -> F.Column:
    """F5 multi-pattern extraction (reference :174-237): pull ALL known
    facility names out of a concatenated cell. Longest-first alternation
    reproduces the reference's match-and-remove loop for non-nesting
    patterns (Java regex alternation is first-match-wins per position)."""
    ordered = sorted(cfg.known_facilities + cfg.streams, key=len, reverse=True)
    import re as _re

    pattern = "(" + "|".join(_re.escape(p) for p in ordered) + ")"
    return F.regexp_extract_all(c, F.lit(pattern), 1)


def parse_disposal_targets(col: F.Column, cfg: WasteItemConfig = DEFAULT_CONFIG) -> F.Column:
    """X2 target-expansion pipeline (reference :123-171
    parse_disposal_targets): newline-split → per-part length branch
    (>30 chars: concat extraction; else validate+normalize) → flatten →
    sentinel filter → dedup. Returns an array column; explode at the
    call site. One codegen'd expression tree — zero Python per row."""
    parts = F.filter(
        F.transform(F.split(col, "\n"), lambda p: F.trim(p)),
        lambda p: ~p.isin("-", ""),  # sentinel filter P5 (reference :134-135)
    )
    expanded = F.flatten(
        F.transform(
            parts,
            lambda p: F.when(
                F.length(p) > cfg.concat_threshold, _extract_known(p, cfg)
            ).otherwise(
                F.filter(F.array(_normalize(p, cfg)), lambda t: _is_valid_name(t, cfg))
            ),
        )
    )
    normalized = F.transform(expanded, lambda t: _normalize(t, cfg))
    return F.array_distinct(normalized)  # D1 (reference :171)


def load_waste_items(
    spark: SparkSession, filepath: str, cfg: WasteItemConfig = DEFAULT_CONFIG
) -> DataFrame:
    """S1 CSV scan + row filters + target expansion (reference :251-281).
    Returns (name, disposal_targets: array<string>)."""
    raw = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(filepath)
    )
    name, targets = F.col("Abfallart"), F.coalesce(F.col("Entsorgungsweg"), F.lit(""))
    return (
        raw.filter(~_is_section_marker(name, targets))  # P2 (reference :265-267)
        .filter(F.trim(name) != "")  # P3 (reference :269-271)
        .select(
            F.trim(name).alias("name"),
            parse_disposal_targets(targets, cfg).alias("disposal_targets"),
        )
    )


def import_waste_items(
    spark: SparkSession,
    filepath: str,
    facilities: DataFrame,
    existing_items: DataFrame | None = None,
    existing_edges: DataFrame | None = None,
    cfg: WasteItemConfig = DEFAULT_CONFIG,
    dry_run: bool = False,
):
    """Full import (reference :308-429) as THREE set operations.

    The reference's read-before-write facility lookup (:302-305) becomes
    an explicit DAG input: `facilities` (phase-1 output) joins against the
    classified targets — the ordering dependency is visible in the plan
    instead of hidden in database state.

    Returns (items_df, edges_df, stats_row). With dry_run=True nothing is
    merged; stats mirror the reference's dry-run report (:329-353).
    """
    items = load_waste_items(spark, filepath, cfg)
    target = items.select(
        "name", F.explode_outer("disposal_targets").alias("target")
    )
    classified = target.withColumn(
        "kind",
        F.when(F.col("target").isNull(), None)
        .when(F.col("target").isin(*cfg.streams), "stream")  # D3 (reference :284-299)
        .otherwise("facility"),
    )
    fac_names = facilities.select(F.col("name").alias("target"))
    resolved = classified.join(F.broadcast(fac_names.withColumn("known", F.lit(True))),
                               "target", "left")

    stats = resolved.agg(
        F.countDistinct("name").alias("items_loaded"),
        F.countDistinct(F.when(F.col("kind") == "stream", F.col("target"))).alias("streams_needed"),
        F.sum(F.when(F.col("kind").isNotNull(), 1).otherwise(0)).alias("targets_total"),
        F.sum(
            F.when((F.col("kind") == "facility") & F.col("known").isNull(), 1).otherwise(0)
        ).alias("unmatched_facilities"),  # anti-join warning path (reference :414-419)
    ).collect()[0]

    if dry_run:
        return None, None, stats

    item_nodes = items.select(
        uid_hash("name").alias("uid"),  # F1 (reference :61-63)
        "name",
    )
    existing_items = existing_items if existing_items is not None else item_nodes.limit(0)
    merged_items = merge_upsert(existing_items, item_nodes, keys=["uid"])

    edges = (
        resolved.filter(
            (F.col("kind") == "stream") | ((F.col("kind") == "facility") & F.col("known").isNotNull())
        )
        .select(
            uid_hash("name").alias("src_uid"),
            uid_hash("target").alias("dst_uid"),
            F.when(F.col("kind") == "stream", "DISPOSED_IN")
            .otherwise("DISPOSED_AT")
            .alias("rel_type"),
        )
    )
    existing_edges = existing_edges if existing_edges is not None else edges.limit(0)
    merged_edges = upsert_edges(existing_edges, edges)
    return merged_items, merged_edges, stats


def load_waste_items_xlsx(
    spark: SparkSession,
    filepath: str,
    sheet: str = "Abfall_ABC",
    cfg: WasteItemConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """S1 over the reference's ACTUAL input format: Abfall_ABC.xlsx
    (reference README.md:124 — the CSV its code reads is an export of
    this workbook). Same filters/expansion as load_waste_items; the scan
    is the stdlib SpreadsheetML reader (operators/xlsx.py) distributed
    over binaryFile rows, so both ingest paths produce identical rows —
    asserted by tests/test_etl_reference.py::test_xlsx_and_csv_ingest_agree."""
    from graph_etl_pipeline_spark.operators.xlsx import read_xlsx

    raw = read_xlsx(
        spark, filepath, sheet=sheet,
        schema="Abfallart string, Entsorgungsweg string",
    )
    name, targets = F.col("Abfallart"), F.coalesce(F.col("Entsorgungsweg"), F.lit(""))
    return (
        raw.filter(~_is_section_marker(name, targets))
        .filter(F.trim(name) != "")
        .select(
            F.trim(name).alias("name"),
            parse_disposal_targets(targets, cfg).alias("disposal_targets"),
        )
    )
