"""Differential test mirroring the driver's t2 correctness gate: every
registered query with an oracle must match DuckDB on row count, schema,
and order-insensitive values (SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from graph_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tests.parity import compare

SPECS = sorted(all_queries().values(), key=lambda s: s.name)


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle], ids=lambda s: s.name)
def test_oracle_parity(spark, spec):
    df = spec.fn(spark, SF_SMOKE)
    problems = compare(df, spec.oracle, SF_SMOKE)
    assert not problems, f"{spec.name}: " + "; ".join(problems)


@pytest.mark.parametrize("spec", [s for s in SPECS if s.oracle is None], ids=lambda s: s.name)
def test_rows_only(spark, spec):
    """Queries without an oracle still must run and return a stable schema."""
    df = spec.fn(spark, SF_SMOKE)
    assert df.columns
    assert df.count() >= 0
