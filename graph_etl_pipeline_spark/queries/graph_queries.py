"""Graph-layer queries (SURVEY.md §2.5 J6, §2.1 S9, §5.1 validation corpus)
exercised through the PropertyGraph vertex/edge DataFrames."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graph_etl_pipeline_spark.graph.build import star_graph
from graph_etl_pipeline_spark.registry import register


@register(
    "graph_count_by_label",
    oracle="""
    SELECT 'vertex' AS kind, label, n FROM (
        SELECT 'Region' AS label, COUNT(*) AS n FROM region
        UNION ALL SELECT 'Nation', COUNT(*) FROM nation
        UNION ALL SELECT 'Customer', COUNT(*) FROM customer
        UNION ALL SELECT 'Supplier', COUNT(*) FROM supplier
        UNION ALL SELECT 'Order', COUNT(*) FROM orders
    )
    UNION ALL
    SELECT 'edge' AS kind, rel_type AS label, n FROM (
        SELECT 'IN_REGION' AS rel_type, COUNT(*) AS n FROM nation
        UNION ALL SELECT 'IN_NATION', COUNT(*) FROM customer
        UNION ALL SELECT 'SUPP_NATION', COUNT(*) FROM supplier
        UNION ALL SELECT 'PLACED_BY', COUNT(*) FROM orders
    )
    """,
    tags=("graph", "agg"),
)
def graph_count_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/A1: catalog stats — node counts per label + edge counts per type
    (reference: src/db/neo4j_db.py:122-149 get_stats; the 1+N+1 query loop
    becomes two hash aggregations over the union views)."""
    g = star_graph(spark, sf_dir)
    v = g.label_counts().select(F.lit("vertex").alias("kind"), "label", "n")
    e = g.edge_type_counts().select(
        F.lit("edge").alias("kind"), F.col("rel_type").alias("label"), "n"
    )
    return v.unionByName(e)


@register(
    "graph_reachability",
    oracle="""
    SELECT r_name AS root, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("graph", "traversal"),
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: bounded variable-length traversal (reference: schema.cql:122 —
    AVV HAS_PARENT level 3→2→1 rollup; Schema_Doku.pdf §6 NEXT_CHECK
    chains). Frontier iteration from each Region root over reversed
    containment edges; the oracle is the closed-form join chain, so the
    iterative engine must converge to exactly the static plan's answer."""
    g = star_graph(spark, sf_dir)
    roots = g.vertices.filter(F.col("label") == "Region").select(
        "uid", F.col("name").alias("root")
    )
    visited = g.reachable(
        roots, rel_types=("IN_REGION", "IN_NATION"), direction="in", max_depth=3
    )
    customers = g.vertices.filter(F.col("label") == "Customer").select("uid")
    return (
        visited.join(customers, "uid")
        .groupBy("root")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "graph_orphan_antijoin",
    oracle="""
    SELECT CAST('C' || CAST(c_custkey AS VARCHAR) AS VARCHAR) AS uid,
           c_name AS name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("graph", "audit"),
)
def graph_orphan_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation corpus: orphan detection (reference:
    etl_implementation.md:238 — WasteItems with no DISPOSED_IN/DISPOSED_AT
    edge). Customers with no incoming PLACED_BY edge, via the graph
    layer's anti-join."""
    g = star_graph(spark, sf_dir)
    return g.orphans("Customer", rel_types=("PLACED_BY",), direction="in").select(
        "uid", "name"
    )


@register(
    "graph_pattern_match",
    oracle="""
    SELECT n_name AS dst_name, COUNT(*) AS n_edges
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("graph",),
)
def graph_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern API (SURVEY §4.2): `MATCH (:Customer)-[:IN_NATION]->(:Nation)`
    via PropertyGraph.match — edge fan-in per nation (reference
    etl_implementation.md:249-251 items-per-stream shape, through the
    graph ergonomics layer instead of raw joins)."""
    g = star_graph(spark, sf_dir)
    return (
        g.match("Customer", "IN_NATION", "Nation")
        .groupBy(F.col("dst_name").alias("dst_name"))
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )


@register(
    "graph_connected_components",
    oracle="""
    SELECT uid, component FROM (
        SELECT 'C' || CAST(c_custkey AS VARCHAR) AS uid,
               'C' || CAST(c_custkey AS VARCHAR) AS component
        FROM customer
        UNION ALL
        SELECT 'O' || CAST(o_orderkey AS VARCHAR),
               'C' || CAST(o_custkey AS VARCHAR)
        FROM orders
    )
    """,
    tags=("graph", "iterative"),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed connected components (hash-min label propagation, see
    PropertyGraph.connected_components) over the PLACED_BY subgraph:
    customers ∪ their orders. Ground truth is closed-form — each
    component is one customer plus their orders, and since 'C…' sorts
    before 'O…' the min-uid representative is always the customer's uid —
    so the ITERATIVE algorithm must converge to exactly the static
    answer (same oracle discipline as graph_reachability). Customers
    with no orders stay singleton components. Multi-hop convergence on a
    long planted chain is exercised in tests/test_library.py."""
    from graph_etl_pipeline_spark.graph.model import PropertyGraph

    g = star_graph(spark, sf_dir)
    sub = PropertyGraph(
        vertices=g.vertices.filter(F.col("label").isin("Customer", "Order")),
        edges=g.edges.filter(F.col("rel_type") == "PLACED_BY"),
    )
    return sub.connected_components()
