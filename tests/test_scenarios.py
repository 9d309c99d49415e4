"""End-to-end reasoning-flow scenarios (reference: Schema_Doku.pdf §7 —
the acceptance scenarios the reference's graph must answer; SURVEY §5.1):
banana peel (simple stream route), paint bucket (condition tree + AVV
validation), electric toothbrush (campus rule overrides city rule)."""

from __future__ import annotations

import pytest

from graph_etl_pipeline_spark.graph.model import PropertyGraph
from graph_etl_pipeline_spark.graph.reasoning import resolve_streams, validate_avv_paths


@pytest.fixture(scope="module")
def rule_graph(spark):
    vertices = spark.createDataFrame(
        [
            # items
            ("i_banana", "WasteItem", "Bananenschale"),
            ("i_paint", "WasteItem", "Farbeimer"),
            ("i_brush", "WasteItem", "Elektrozahnbürste"),
            # streams
            ("s_bio", "WasteStream", "Biotonne"),
            ("s_rest", "WasteStream", "Restabfalltonne"),
            ("s_schad", "WasteStream", "Schadstoffsammlung"),
            ("s_elektro", "WasteStream", "Elektrokleingerät"),
            # rules (name carries scope)
            ("r_paint", "DisposalRule", "city"),
            ("r_brush_city", "DisposalRule", "city"),
            ("r_brush_campus", "DisposalRule", "campus"),
            # conditions
            ("c_empty", "Condition", "Ist der Eimer restentleert?"),
            ("c_dried", "Condition", "Ist die Farbe eingetrocknet?"),
            ("c_battery", "Condition", "Enthält das Gerät einen Akku?"),
            ("c_battery_campus", "Condition", "Enthält das Gerät einen Akku? (Campus)"),
            # AVV codes
            ("a_0801", "AVVCode", "08 01"),
        ],
        "uid string, label string, name string",
    )
    edges = spark.createDataFrame(
        [
            # banana: simple direct route (§7.1)
            ("i_banana", "s_bio", "DISPOSED_IN"),
            # paint bucket: multi-step condition chain (§7.2)
            ("i_paint", "r_paint", "HAS_RULE"),
            ("r_paint", "c_empty", "HAS_CONDITION"),
            ("c_empty", "s_rest", "IF_TRUE"),  # empty bucket → residual
            ("c_empty", "c_dried", "IF_FALSE"),  # else: is it dried?
            ("c_dried", "s_rest", "IF_TRUE"),
            ("c_dried", "s_schad", "IF_FALSE"),  # wet paint → hazardous
            # toothbrush: city rule says residual, campus overrides (§7.3)
            ("i_brush", "r_brush_city", "HAS_RULE"),
            ("r_brush_city", "c_battery", "HAS_CONDITION"),
            ("c_battery", "s_rest", "IF_FALSE"),
            ("c_battery", "s_schad", "IF_TRUE"),
            # campus rule owns its OWN condition node: sharing c_battery
            # with a different IF_TRUE target would make the graph
            # ambiguous (validate_branch_determinism flags that shape)
            ("i_brush", "r_brush_campus", "HAS_RULE"),
            ("r_brush_campus", "c_battery_campus", "HAS_CONDITION"),
            ("c_battery_campus", "s_elektro", "IF_TRUE"),
            ("c_battery_campus", "s_rest", "IF_FALSE"),
            # AVV validation (§4.10): paint requires 08 01; only
            # Schadstoffsammlung is allowed to take it
            ("i_paint", "a_0801", "REQUIRES_AVV"),
            ("s_schad", "a_0801", "ALLOWS_AVV"),
        ],
        "src_uid string, dst_uid string, rel_type string",
    )
    return PropertyGraph(vertices=vertices, edges=edges)


def _answers(spark, **by_uid):
    # the campus twin of c_battery answers identically
    items = list(by_uid.items())
    if "c_battery" in by_uid:
        items.append(("c_battery_campus", by_uid["c_battery"]))
    return spark.createDataFrame(items, "condition_uid string, answer boolean")


def test_banana_peel_direct_route(spark, rule_graph):
    out = resolve_streams(rule_graph, _answers(spark, c_empty=True, c_battery=False))
    routes = {r.item_uid: (r.stream_uid, r.via) for r in out.collect()}
    assert routes["i_banana"] == ("s_bio", "direct")


def test_paint_bucket_condition_chain(spark, rule_graph):
    # wet, non-empty paint → two-level chain ends at Schadstoffsammlung
    out = resolve_streams(
        rule_graph, _answers(spark, c_empty=False, c_dried=False, c_battery=False)
    )
    routes = {r.item_uid: r.stream_uid for r in out.collect()}
    assert routes["i_paint"] == "s_schad"
    # empty bucket short-circuits at level 1
    out2 = resolve_streams(
        rule_graph, _answers(spark, c_empty=True, c_battery=False)
    )
    routes2 = {r.item_uid: r.stream_uid for r in out2.collect()}
    assert routes2["i_paint"] == "s_rest"


def test_campus_overrides_city(spark, rule_graph):
    # battery device: city rule → Schadstoffsammlung, campus rule →
    # Elektrokleingerät; campus must win (§7.3)
    out = resolve_streams(rule_graph, _answers(spark, c_empty=True, c_battery=True))
    routes = {r.item_uid: r.stream_uid for r in out.collect()}
    assert routes["i_brush"] == "s_elektro"


def test_branch_determinism_audit(spark, rule_graph):
    from graph_etl_pipeline_spark.graph.reasoning import validate_branch_determinism

    # the fixture graph is well-formed
    assert validate_branch_determinism(rule_graph).isEmpty()
    # sharing one condition across rules with conflicting IF_TRUE targets
    # is flagged
    bad = rule_graph.edges.sparkSession.createDataFrame(
        [("c_battery", "s_elektro", "IF_TRUE")],
        "src_uid string, dst_uid string, rel_type string",
    )
    g_bad = PropertyGraph(rule_graph.vertices, rule_graph.edges.unionByName(bad))
    rows = validate_branch_determinism(g_bad).collect()
    assert [(r.node_uid, r.rel_type, r.n_targets) for r in rows] == [
        ("c_battery", "IF_TRUE", 2)
    ]


def test_avv_validation(spark, rule_graph):
    # i_paint requires 08 01; only s_schad ALLOWS it. Add a DISPOSED_IN
    # edge to the WRONG stream → violation; to the right one → clean.
    from pyspark.sql import functions as F

    bad_edge = rule_graph.edges.sparkSession.createDataFrame(
        [("i_paint", "s_rest", "DISPOSED_IN")],
        "src_uid string, dst_uid string, rel_type string",
    )
    g_bad = PropertyGraph(rule_graph.vertices, rule_graph.edges.unionByName(bad_edge))
    violations = validate_avv_paths(g_bad).collect()
    assert [(v.item_uid, v.stream_uid) for v in violations] == [("i_paint", "s_rest")]

    good_edge = bad_edge.withColumn("dst_uid", F.lit("s_schad"))
    g_good = PropertyGraph(rule_graph.vertices, rule_graph.edges.unionByName(good_edge))
    assert validate_avv_paths(g_good).isEmpty()
