"""Round-11 operator tests: HyperANF sketched neighborhood function."""

from __future__ import annotations

import datetime
import hashlib

from tests.test_r10_operators import EVENTS_SCHEMA


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(f"{path}/events.parquet")


def _anf_hash(node: int) -> tuple[int, int]:
    """Python replay of the (register index, rho) vertex hash: two 32-bit
    md5 lanes, j = lane1 mod 16, rho = rank of the leftmost 1 bit of
    lane2 within 32 (33 for lane2 == 0)."""
    h = hashlib.md5(f"anf:{node}".encode()).hexdigest()
    lane1, lane2 = int(h[:8], 16), int(h[8:16], 16)
    rho = 33 if lane2 == 0 else 33 - lane2.bit_length()
    return lane1 % 16, rho


def _anf_denom(members: set[int]) -> int:
    regs = [0] * 16
    for v in members:
        j, rho = _anf_hash(v)
        regs[j] = max(regs[j], rho)
    return sum(1 << (33 - m) for m in regs)


def test_hyperanf_path_graph_matches_python_replay(spark, tmp_path):
    """Path 1-2-3-4-5: per-hop balls are literal intervals, so the packed
    register iteration must reproduce a from-scratch Python HLL over each
    exact ball — register MAX over a set equals MAX over any union
    decomposition, so ANY divergence is an iteration/packing bug."""
    from graph_etl_pipeline_spark.queries.graph_queries import (
        graph_hyperanf_sketch,
    )

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (u, base + datetime.timedelta(minutes=u), u, "click", 1.0, "{}")
        for u in range(1, 6)
    ]
    sf = str(tmp_path / "anf")
    _write_events(spark, sf, rows)

    got = {r.node: (r.d1, r.d2, r.d3, r.est1) for r in graph_hyperanf_sketch(spark, sf).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    num = 0.673 * 256 * 8589934592.0
    for v in range(1, 6):
        expect = tuple(
            _anf_denom({u for u in range(1, 6) if abs(u - v) <= hop})
            for hop in (1, 2, 3)
        )
        assert got[v][:3] == expect, f"node {v}"
        assert got[v][3] == num / float(expect[0]), f"node {v} est1"


def test_hyperanf_registers_monotone_and_saturating(spark, tmp_path):
    """Two structural contracts on a star graph (hub 10, leaves 11..14):
    denominators never increase hop over hop (balls only grow), and from
    the hop where the ball saturates every vertex's denominator equals
    the whole-graph HLL denominator."""
    from graph_etl_pipeline_spark.queries.graph_queries import (
        graph_hyperanf_sketch,
    )

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    # One hour-chain through the hub first: hub then each leaf gives
    # edges hub-11, 11-12, 12-13, 13-14? No — the chain links CONSECUTIVE
    # users per hour, so craft hours: each hour holds (hub, leaf) only.
    rows = []
    eid = 0
    for i, leaf in enumerate((11, 12, 13, 14)):
        h = base + datetime.timedelta(hours=i)
        rows.append((eid, h, 10, "click", 1.0, "{}")); eid += 1
        rows.append((eid, h + datetime.timedelta(minutes=1), leaf, "click", 1.0, "{}")); eid += 1
    sf = str(tmp_path / "anfstar")
    _write_events(spark, sf, rows)

    out = {r.node: (r.d1, r.d2, r.d3) for r in graph_hyperanf_sketch(spark, sf).collect()}
    assert set(out) == {10, 11, 12, 13, 14}
    full = _anf_denom({10, 11, 12, 13, 14})
    for v, (d1, d2, d3) in out.items():
        assert d1 >= d2 >= d3, f"node {v} not monotone"
        assert d2 == d3 == full, f"node {v}: ball saturates at hop 2 on a star"
    assert out[10][0] == full  # hub sees everyone at hop 1


def test_welch_t_survives_multimillion_row_halves(spark, tmp_path):
    """ADVICE r10 regression gate: with ~3M rows per half the OLD common
    denominator n1²(n1−1)·n2²(n2−1) ≈ 6·10^38 overflows decimal(38) (Spark
    nulls it; DuckDB raises on HUGEINT) — the per-half pairs must stay
    finite, exact, and match a closed-form integer replay."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from fractions import Fraction

    from graph_etl_pipeline_spark.queries.aggregates import agg_welch_t_drift

    n1 = n2 = 3_000_000
    base_us = 1_700_000_000_000_000  # fixed epoch micros
    hour_us = 3_600 * 10**6
    # early half: value 10.00 except one 10.01 (variance > 0); late half:
    # 20.00 except one 20.02 — arithmetic stays closed-form.
    ts = pa.array(
        [base_us] * n1 + [base_us + 4 * hour_us] * n2, pa.timestamp("us")
    )
    val = pa.array(
        [10.00] * (n1 - 1) + [10.01] + [20.00] * (n2 - 1) + [20.02], pa.float64()
    )
    n = n1 + n2
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts,
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": val,
            "props": pa.array([None] * n, pa.string()),
        }
    )
    sf = str(tmp_path / "welchbig")
    import os
    os.makedirs(f"{sf}/events.parquet", exist_ok=True)
    pq.write_table(tbl, f"{sf}/events.parquet/part-0.parquet")

    (row,) = agg_welch_t_drift(spark, sf).collect()
    assert (row.n1, row.n2) == (n1, n2)
    s1 = 1000 * (n1 - 1) + 1001
    s2 = 2000 * (n2 - 1) + 2002
    q1 = 1000**2 * (n1 - 1) + 1001**2
    q2 = 2000**2 * (n2 - 1) + 2002**2
    assert int(row.delta_num) == s1 * n2 - s2 * n1
    assert int(row.delta_den) == n1 * n2
    assert int(row.var1_num) == n1 * q1 - s1 * s1  # ~10^19: inside decimal(38)
    assert int(row.var1_den) == n1 * n1 * (n1 - 1)  # ~10^19: the OLD common
    assert int(row.var2_num) == n2 * q2 - s2 * s2  # denominator was ~10^38+
    assert int(row.var2_den) == n2 * n2 * (n2 - 1)
    t2 = Fraction(int(row.delta_num), n1 * n2) ** 2 / (
        Fraction(int(row.var1_num), int(row.var1_den))
        + Fraction(int(row.var2_num), int(row.var2_den))
    )
    assert row.t2 is not None and abs(row.t2 - float(t2)) < 1e-9 * float(t2)


def test_neighborhood_function_path_graph_replay(spark, tmp_path):
    """Path 1-2-3-4-5: N(t)_milli must equal the Python replay
    Σ_v (673·256·2^33 div D_t(v)) over the exact interval balls, and the
    ppm fractions must floor-divide against the hop-3 value."""
    from graph_etl_pipeline_spark.queries.graph_queries import (
        ANF_NUM_MILLI, graph_neighborhood_function,
    )

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (u, base + datetime.timedelta(minutes=u), u, "click", 1.0, "{}")
        for u in range(1, 6)
    ]
    sf = str(tmp_path / "nf")
    _write_events(spark, sf, rows)

    nf = {}
    for hop in (1, 2, 3):
        nf[hop] = sum(
            ANF_NUM_MILLI // _anf_denom({u for u in range(1, 6) if abs(u - v) <= hop})
            for v in range(1, 6)
        )
    got = {r.hop: (r.n_vertices, r.nf_milli, r.frac_of_h3_ppm)
           for r in graph_neighborhood_function(spark, sf).collect()}
    assert got == {
        t: (5, nf[t], nf[t] * 1_000_000 // nf[3]) for t in (1, 2, 3)
    }
    # N(t) is monotone non-decreasing and hop3 fraction is exactly 10^6
    assert nf[1] <= nf[2] <= nf[3] and got[3][2] == 1_000_000
