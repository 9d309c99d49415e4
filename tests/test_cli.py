"""CLI surface tests (SURVEY §2.11): every verb a reference user would
reach for must run against the test tables and emit parseable output."""

from __future__ import annotations

import json

from graph_etl_pipeline_spark.cli import main
from tests.conftest import SF_SMOKE


def test_cli_list_enumerates_registry(spark, capsys):
    assert main(["list"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    names = {r["name"] for r in lines}
    assert {"join_four_hop_chain", "dedup_minhash_lsh", "src_pdf_scan"} <= names
    assert all(set(r) == {"name", "tags", "oracle"} for r in lines)
    # zero rows-only queries: every registered entry carries an oracle
    # (sim_ann_ivf retired from the registry, VERDICT r7 #5 — its plan is
    # hash-checked through sim_ann_recall_contract)
    assert [r["name"] for r in lines if not r["oracle"]] == []


def test_cli_run_executes_registered_query(spark, capsys):
    assert main(["run", "agg_count_by_label", "--sf-dir", SF_SMOKE, "--limit", "3"]) == 0
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(rows) <= 3
    assert set(rows[0]) == {"label", "n"}


def test_cli_explain_prints_physical_plan(spark, capsys):
    assert main(["explain", "join_broadcast_inner", "--sf-dir", SF_SMOKE]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
