"""Planted-fixture unit tests for the round-10 operators. Each test
hand-computes the expected result on a tiny constructed input — the
oracle-parity suite separately checks every operator against DuckDB on
the shared testdata, so these pin the SEMANTICS on inputs engineered to
hit the edge the operator exists for."""

from __future__ import annotations

import datetime

import pytest

from tests.conftest import SF_SMOKE

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(f"{path}/events.parquet")


def test_closeness_sampled_path_graph(spark, tmp_path):
    """Path 1-2-3-4-5: K=16 pivots > |V|, so every vertex is a pivot and
    the sampled estimator must equal the exact bounded closeness —
    hand-computed (n_src_reached, sum_dist) per node."""
    from graph_etl_pipeline_spark.queries.graph_queries import (
        graph_closeness_sampled,
    )

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (u, base + datetime.timedelta(minutes=u), u, "click", 1.0, "{}")
        for u in range(1, 6)
    ]
    sf = str(tmp_path / "cls")
    _write_events(spark, sf, rows)

    got = {
        r.node: (r.n_src_reached, r.sum_dist, r.closeness_ppm)
        for r in graph_closeness_sampled(spark, sf).collect()
    }
    assert got == {
        1: (3, 6, 500_000),
        2: (4, 7, 571_428),
        3: (4, 6, 666_666),
        4: (4, 7, 571_428),
        5: (3, 6, 500_000),
    }


def test_cusum_alarm_matches_sequential_recurrence(spark, tmp_path):
    """One user, a value series with a planted upward drift: the windowed
    closed form must equal the literal sequential recurrence
    S_n = max(0, S_{n-1} + x_n - k), including the alarm crossing."""
    from graph_etl_pipeline_spark.queries.windows import (
        CUSUM_ALARM_CENTS, CUSUM_DRIFT_CENTS, win_cusum_alarm,
    )

    values = [10.0, 200.0, 5.0, 400.0, 300.0, 1.0, 250.0, 260.0, 270.0]
    base = datetime.datetime(2024, 5, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 7, "click", v, "{}")
        for i, v in enumerate(values)
    ]
    sf = str(tmp_path / "cusum")
    _write_events(spark, sf, rows)

    s, expect = 0, []
    for v in values:
        s = max(0, s + round(v * 100) - CUSUM_DRIFT_CENTS)
        expect.append((s, s >= CUSUM_ALARM_CENTS))

    out = sorted(win_cusum_alarm(spark, sf).collect(), key=lambda r: r.event_id)
    assert [(r.cusum_cents, r.alarm) for r in out] == expect
    assert any(a for _, a in expect)  # the fixture actually crosses h


def test_weighted_median_range_frame_ties(spark, tmp_path):
    """Hand-computed weighted medians, including a tied-value group and
    an even-total group where the lower weighted median must win."""
    from graph_etl_pipeline_spark.queries.aggregates import agg_weighted_median

    t = datetime.datetime(2024, 1, 1)
    rows = [
        # flag A: cents 100 w1, 200 w2, 300 w1 -> W=4, median 200
        (1, 1, 1, 1, 1.0, 1.00, 0.0, 0.0, "A", "O", t),
        (1, 1, 1, 2, 2.0, 2.00, 0.0, 0.0, "A", "O", t),
        (2, 1, 1, 1, 1.0, 3.00, 0.0, 0.0, "A", "O", t),
        # flag B: cents 100 w1, 200 w1 -> W=2, lower median 100
        (3, 1, 1, 1, 1.0, 1.00, 0.0, 0.0, "B", "O", t),
        (3, 1, 1, 2, 1.0, 2.00, 0.0, 0.0, "B", "O", t),
        # flag C: tied cents 500 w1 + 500 w1 + 700 w1 -> median 500
        (4, 1, 1, 1, 1.0, 5.00, 0.0, 0.0, "C", "O", t),
        (4, 1, 1, 2, 1.0, 5.00, 0.0, 0.0, "C", "O", t),
        (4, 1, 1, 3, 1.0, 7.00, 0.0, 0.0, "C", "O", t),
    ]
    sf = str(tmp_path / "wmed")
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{sf}/lineitem.parquet")

    got = {
        r.flag: (r.total_weight, r.wmedian_cents)
        for r in agg_weighted_median(spark, sf).collect()
    }
    assert got == {"A": (4, 200), "B": (2, 100), "C": (3, 500)}


def test_referential_integrity_planted_orphans(spark, tmp_path):
    """A minimal star with exactly one orphan order key (two rows) and one
    orphan supplier key: counts, key lists, and ppm must be exact."""
    from graph_etl_pipeline_spark.queries.quality import dq_referential_integrity

    sf = str(tmp_path / "ri")
    t = datetime.datetime(2024, 1, 1)
    spark.createDataFrame([(0, "R0")], "r_regionkey long, r_name string").write.parquet(f"{sf}/region.parquet")
    spark.createDataFrame([(0, "N0", 0)], "n_nationkey long, n_name string, n_regionkey long").write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame([(1, "C1", 0)], "c_custkey long, c_name string, c_nationkey long").write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(1, "S1", 0), (2, "S2", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    ).write.parquet(f"{sf}/supplier.parquet")
    spark.createDataFrame([(1, "P1")], "p_partkey long, p_name string").write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame(
        [(10, 1, "O", 1.0, t, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")
    # lineitem: 3 rows on good order 10, 2 rows on MISSING order 99;
    # one row references MISSING supplier 9.
    li = [
        (10, 1, 1, 1), (10, 1, 2, 2), (10, 1, 1, 3),
        (99, 1, 1, 1), (99, 1, 9, 2),
    ]
    spark.createDataFrame(
        [(o, p, s, ln, 1.0, 1.0, 0.0, 0.0, "A", "O", t) for o, p, s, ln in li],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).write.parquet(f"{sf}/lineitem.parquet")

    got = {r.fk_edge: r for r in dq_referential_integrity(spark, sf).collect()}
    ok = got["lineitem.l_orderkey"]
    assert (ok.n_rows, ok.n_keys, ok.n_orphan_rows, ok.n_orphan_keys) == (5, 2, 2, 1)
    assert ok.orphan_ppm == 2 * 1_000_000 // 5
    sk = got["lineitem.l_suppkey"]
    assert (sk.n_orphan_rows, sk.n_orphan_keys) == (1, 1)
    assert got["orders.o_custkey"].n_orphan_rows == 0
    assert got["nation.n_regionkey"].orphan_ppm == 0
    assert len(got) == 7


def test_filter_funnel_sequential_attrition(spark, tmp_path):
    """Five planted docs: one survivor, one too short, one under the token
    floor, one repetitive, and an exact duplicate of the survivor — each
    must fall at ITS stage, and the funnel must chain (n_in of stage k+1
    == n_kept of stage k)."""
    from graph_etl_pipeline_spark.queries.composite import (
        FUNNEL_MIN_CHARS, pipeline_filter_funnel,
    )

    good = " ".join(f"tok{i}" for i in range(60))
    assert len(good) >= FUNNEL_MIN_CHARS
    rep = ("dup " * 80).strip()  # long enough, enough tokens, 1 distinct
    docs = [
        (1, good, "en", "web", len(good)),
        (2, "tiny", "en", "web", 4),                      # stage 1
        (3, "x" * 250, "en", "web", 250),                 # stage 2: 1 token
        (4, rep, "en", "web", len(rep)),                  # stage 3
        (5, good, "en", "web", len(good)),                # stage 4 dup of 1
    ]
    sf = str(tmp_path / "funnel")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    rows = {r.stage: r for r in pipeline_filter_funnel(spark, sf).collect()}
    assert [(rows[s].n_in, rows[s].n_kept) for s in (1, 2, 3, 4)] == [
        (5, 4), (4, 3), (3, 2), (2, 1),
    ]
    assert [rows[s].filter_name for s in (1, 2, 3, 4)] == [
        "len_floor", "token_floor", "repetition_cap", "exact_dedup",
    ]
    assert all(rows[s].n_dropped == rows[s].n_in - rows[s].n_kept for s in rows)


def test_csv_quarantine_flags_and_recovers(spark):
    """On the real customer table: quarantined set must be exactly the
    planted corruption residue, recovered keys must cover every source
    row, and clean rows must carry exact cents."""
    import duckdb

    from graph_etl_pipeline_spark.queries.sources import (
        QUARANTINE_MOD, QUARANTINE_RESIDUE, src_csv_quarantine,
    )

    out = src_csv_quarantine(spark, SF_SMOKE).collect()
    src = dict(
        duckdb.sql(
            f"SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT)"
            f" FROM '{SF_SMOKE}/customer.parquet'"
        ).fetchall()
    )
    assert {r.c_custkey for r in out} == set(src)
    for r in out:
        assert r.quarantined == (r.c_custkey % QUARANTINE_MOD == QUARANTINE_RESIDUE)
        assert r.acctbal_cents == (None if r.quarantined else src[r.c_custkey])
    assert any(r.quarantined for r in out)


def test_pack_tokenized_cap_offsets_straddle(spark, tmp_path):
    """Three docs: one under the cap, one OVER the truncation cap, one
    empty — offsets, seq ids, and the straddle flag replayed in Python."""
    from graph_etl_pipeline_spark.queries.textops import (
        PACK_SEQ_LEN, PACK_TOK_MAXLEN, text_pack_tokenized,
    )

    docs = [
        (1, "a " * 100, "en", "w", 200),          # 100 tokens
        (2, "b " * (PACK_TOK_MAXLEN + 88), "en", "w", 0),  # capped at 512
        (3, "", "en", "w", 0),                     # zero tokens
        (4, "c " * 30, "en", "w", 60),
    ]
    sf = str(tmp_path / "packtok")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    out = {r.doc_id: r for r in text_pack_tokenized(spark, sf).collect()}
    n_bpe = {1: 100, 2: PACK_TOK_MAXLEN + 88, 3: 0, 4: 30}
    off, expect = 0, {}
    for did in sorted(n_bpe):
        n_tok = min(n_bpe[did], PACK_TOK_MAXLEN)
        seq = off // PACK_SEQ_LEN
        end = (off + n_tok - 1) // PACK_SEQ_LEN if n_tok else seq
        expect[did] = (n_bpe[did], n_tok, off, seq, end, n_tok > 0 and end > seq)
        off += n_tok
    got = {
        d: (r.n_bpe, r.n_tok, r.global_offset, r.seq_id, r.end_seq_id, r.straddles)
        for d, r in out.items()
    }
    assert got == expect
    assert out[2].n_tok == PACK_TOK_MAXLEN  # the cap engaged


def test_matryoshka_prefix_disagreement(spark, tmp_path):
    """Planted vectors where the truncated ranker disagrees with the full
    ranker: vec 1 wins on the prefix dims, vec 2 wins on the tail — both
    rank lists and the disagreement join must be exact."""
    from graph_etl_pipeline_spark.queries.similarity import (
        DIM, MRL_PREFIX_DIM, embed_matryoshka_prefix,
    )

    def vec(prefix_val, tail_val):
        return [float(prefix_val)] * MRL_PREFIX_DIM + [float(tail_val)] * (
            DIM - MRL_PREFIX_DIM
        )

    rows = [
        (0, vec(1.0, 1.0), 0),       # probe
        (1, vec(2.0, 0.0), 0),       # prefix specialist
        (2, vec(0.0, 2.0), 0),       # tail specialist
        (3, vec(1.0, 1.0), 0),       # balanced
    ]
    sf = str(tmp_path / "mrl")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")

    out = {r.vec_id: r for r in embed_matryoshka_prefix(spark, sf).collect()}
    assert set(out) == {1, 2, 3}
    # full dots: v1 = 2*16, v2 = 2*48, v3 = 16+48 -> full order 2,3,1
    assert [out[v].full_rank for v in (2, 3, 1)] == [1, 2, 3]
    # prefix dots: v1 = 2*16, v2 = 0, v3 = 16 -> prefix order 1,3,2
    assert [out[v].prefix_rank for v in (1, 3, 2)] == [1, 2, 3]


def test_matryoshka_contract_no_nulls_at_full_k(spark):
    """On the real embeddings table both top-K heaps are full; any row
    with a NULL rank is in exactly one list (the disagreement set)."""
    from graph_etl_pipeline_spark.queries.similarity import (
        MRL_TOPK, embed_matryoshka_prefix,
    )

    out = embed_matryoshka_prefix(spark, SF_SMOKE).collect()
    full = [r for r in out if r.full_rank is not None]
    pref = [r for r in out if r.prefix_rank is not None]
    assert len(full) == MRL_TOPK and len(pref) == MRL_TOPK
    assert sorted(r.full_rank for r in full) == list(range(1, MRL_TOPK + 1))
    assert sorted(r.prefix_rank for r in pref) == list(range(1, MRL_TOPK + 1))


def test_tombstone_compaction_retention(spark, tmp_path):
    """Planted changelog: recent tombstone kept, stale tombstone purged,
    live update kept, tombstone superseded by a newer update kept as the
    update."""
    from graph_etl_pipeline_spark.queries.cdc import (
        COMPACT_TOMBSTONE_DAYS, cdc_tombstone_compaction,
    )

    t = datetime.datetime(2024, 6, 30)
    d = datetime.timedelta
    rows = [
        # key 1: latest is a RECENT tombstone -> kept as tombstone
        (10, 1, "O", 5.0, t - d(days=90), "x"),
        (11, 1, "F", 6.0, t - d(days=5), "x"),
        # key 2: latest is a STALE tombstone -> purged entirely
        (20, 2, "F", 7.0, t - d(days=80), "x"),
        # key 3: plain latest update -> kept with payload
        (30, 3, "O", 8.25, t - d(days=40), "x"),
        (31, 3, "O", 9.75, t - d(days=2), "x"),
        # key 4: old tombstone superseded by a newer update -> kept as update
        (40, 4, "F", 1.0, t - d(days=70), "x"),
        (41, 4, "P", 2.5, t - d(days=1), "x"),
        # key 5 defines max(o_orderdate) = t
        (50, 5, "O", 3.0, t, "x"),
    ]
    sf = str(tmp_path / "compact")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(f"{sf}/orders.parquet")

    out = {r.key: r for r in cdc_tombstone_compaction(spark, sf).collect()}
    assert set(out) == {1, 3, 4, 5}  # key 2's stale tombstone purged
    assert out[1].is_tombstone and out[1].payload_cents is None
    assert (out[3].is_tombstone, out[3].payload_cents) == (False, 975)
    assert (out[4].is_tombstone, out[4].payload_cents) == (False, 250)
    assert COMPACT_TOMBSTONE_DAYS == 30  # fixture horizons assume it


def test_hdr_histogram_buckets_and_quantiles(spark, tmp_path):
    """Planted values replayed through the exact bucket arithmetic in
    Python: exponent from bit length, 4 linear sub-buckets, quantile
    lower bounds from the cumulative bucket walk."""
    from graph_etl_pipeline_spark.queries.aggregates import (
        HDR_SUBS, agg_hdr_histogram,
    )

    values = [0.00, 0.01, 0.02, 0.5, 1.0, 10.0, 10.0, 100.0, 1000.0, 12345.67]
    base = datetime.datetime(2024, 5, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(values)
    ]
    sf = str(tmp_path / "hdr")
    _write_events(spark, sf, rows)

    def bucket(v):
        e = v.bit_length() - 1
        sub = (HDR_SUBS * (v - (1 << e))) >> e
        return e, sub

    def lb(e, sub):
        return ((1 << e) * (HDR_SUBS + sub)) // HDR_SUBS

    from collections import Counter
    hist = Counter(bucket(round(v * 100) + 1) for v in values)
    ordered = sorted(hist)
    n = len(values)

    def pick(pct):
        cw = 0
        for b in ordered:
            cw += hist[b]
            if 100 * cw >= pct * n:
                return lb(*b)

    (row,) = agg_hdr_histogram(spark, sf).collect()
    assert (row.event_type, row.n, row.n_buckets) == ("click", n, len(hist))
    assert (row.p50_lb, row.p95_lb, row.p99_lb) == (pick(50), pick(95), pick(99))


def test_bbox_contains_matches_bruteforce(spark):
    """On the real tables: the grid-cover equi-join must produce exactly
    the brute-force containment pairs (md5 coordinate derivation
    replayed in Python)."""
    import hashlib

    import duckdb

    from graph_etl_pipeline_spark.queries.geo import (
        GEO_BOX_MAX_HALF, GEO_UNITS, geo_bbox_contains_join,
    )

    def lane(seed, key, mod):
        h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:6]
        return int(h, 16) % mod

    custs = [r[0] for r in duckdb.sql(
        f"SELECT c_custkey FROM '{SF_SMOKE}/customer.parquet'").fetchall()]
    supps = [r[0] for r in duckdb.sql(
        f"SELECT s_suppkey FROM '{SF_SMOKE}/supplier.parquet'").fetchall()]
    boxes = {
        s: (
            lane("sx", s, GEO_UNITS), lane("sy", s, GEO_UNITS),
            1 + lane("shw", s, GEO_BOX_MAX_HALF), 1 + lane("shh", s, GEO_BOX_MAX_HALF),
        )
        for s in supps
    }
    expect = {
        (c, s)
        for c in custs
        for s, (cx, cy, hw, hh) in boxes.items()
        if abs(lane("gx", c, GEO_UNITS) - cx) <= hw
        and abs(lane("gy", c, GEO_UNITS) - cy) <= hh
    }
    got = {
        (r.c_custkey, r.s_suppkey)
        for r in geo_bbox_contains_join(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert expect  # the fixture actually produces containments


def test_class_balance_quota_and_draws(spark, tmp_path):
    """Three classes sized 5/3/4: every class cut to exactly 3, and the
    survivors are each class's 3 smallest seeded-md5 draws."""
    import hashlib

    from graph_etl_pipeline_spark.queries.curation import sample_class_balance

    docs, did = [], 0
    for lang, n in (("en", 5), ("de", 3), ("fr", 4)):
        for _ in range(n):
            docs.append((did, f"text {did}", lang, "w", 10))
            did += 1
    sf = str(tmp_path / "bal")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    out = sample_class_balance(spark, sf).collect()
    by_lang = {}
    for r in out:
        assert r.class_quota == 3
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    draw = lambda d: (hashlib.md5(f"bal:{d}".encode()).hexdigest(), d)  # noqa: E731
    for lang, n in (("en", 5), ("de", 3), ("fr", 4)):
        ids = [d for (d, _, lg, _, _) in docs if lg == lang]
        assert by_lang[lang] == set(sorted(ids, key=draw)[:3]), lang


def test_welch_t_pieces_match_python_replay(spark, tmp_path):
    """Two planted halves with different means/variances: the exact int
    rational pieces and the 4-op t² must equal a literal Python replay of
    Welch's formula over the same integers."""
    from fractions import Fraction

    from graph_etl_pipeline_spark.queries.aggregates import agg_welch_t_drift

    base = datetime.datetime(2024, 5, 1)
    early = [10.00, 12.00, 11.00, 13.00, 9.00]        # ts < midpoint
    late = [20.00, 25.00, 30.00, 22.00]                # ts >= midpoint
    rows = [
        (i, base + datetime.timedelta(hours=i), 1, "click", v, "{}")
        for i, v in enumerate(early)
    ] + [
        (100 + i, base + datetime.timedelta(hours=100 + i), 1, "click", v, "{}")
        for i, v in enumerate(late)
    ]
    sf = str(tmp_path / "welch")
    _write_events(spark, sf, rows)

    x1 = [round(v * 100) for v in early]
    x2 = [round(v * 100) for v in late]
    n1, n2, s1, s2 = len(x1), len(x2), sum(x1), sum(x2)
    q1, q2 = sum(v * v for v in x1), sum(v * v for v in x2)
    dnum = s1 * n2 - s2 * n1
    w1, w2 = n1 * n1 * (n1 - 1), n2 * n2 * (n2 - 1)
    v1num, v2num = n1 * q1 - s1 * s1, n2 * q2 - s2 * s2

    (row,) = agg_welch_t_drift(spark, sf).collect()
    assert (row.n1, row.n2) == (n1, n2)
    assert (int(row.delta_num), int(row.delta_den)) == (dnum, n1 * n2)
    # per-half rational pairs (~n⁴ each, not the ~n⁶ common denominator
    # that overflowed decimal(38) past ~2M rows — ADVICE r10)
    assert (int(row.var1_num), int(row.var1_den)) == (v1num, w1)
    assert (int(row.var2_num), int(row.var2_den)) == (v2num, w2)
    # the double is derived from the exact pieces; Fraction replay bounds it
    t2_exact = Fraction(dnum, n1 * n2) ** 2 / (
        Fraction(v1num, w1) + Fraction(v2num, w2)
    )
    assert abs(row.t2 - float(t2_exact)) < 1e-9 * float(t2_exact)
    assert row.t2 > 4  # the planted mean shift is real


def test_stress_sampled_path_graph_replay(spark, tmp_path):
    """Path 1-2-3-4-5: pivots/pairs replayed from the md5 draw, stress
    replayed from unique shortest paths (sigma = 1 on a path graph):
    v's stress = #pairs whose <=3-hop path strictly contains v."""
    import hashlib

    from graph_etl_pipeline_spark.queries.graph_queries import (
        STRESS_HOPS, STRESS_PAIRS, graph_betweenness_stress_sampled,
    )

    base = datetime.datetime(2024, 3, 1, 10, 0, 0)
    rows = [
        (u, base + datetime.timedelta(minutes=u), u, "click", 1.0, "{}")
        for u in range(1, 6)
    ]
    sf = str(tmp_path / "btw")
    _write_events(spark, sf, rows)

    draw = lambda n: (hashlib.md5(f"btw:{n}".encode()).hexdigest(), n)  # noqa: E731
    pv = sorted(range(1, 6), key=draw)[: 2 * STRESS_PAIRS]
    pairs = [(pv[i], pv[i + 1]) for i in range(0, len(pv) - 1, 2)]
    expect = {}
    for s, t in pairs:
        if abs(s - t) > STRESS_HOPS:
            continue  # farther than the hop bound: pair contributes nothing
        for v in range(min(s, t) + 1, max(s, t)):
            expect[v] = expect.get(v, [0, 0])
            expect[v][0] += 1  # sigma products are 1 on a path graph
            expect[v][1] += 1

    got = {
        r.node: [r.stress, r.n_pairs]
        for r in graph_betweenness_stress_sampled(spark, sf).collect()
    }
    assert got == expect


def test_varint_codec_roundtrip_and_truncation():
    from graph_etl_pipeline_spark.queries.sources import (
        varint_encode, varint_records_decode,
    )

    payloads = [b"", b"x", b"a" * 127, b"b" * 128, b"c" * 300, b"tail"]
    blob = b"".join(varint_encode(len(p)) + p for p in payloads)
    assert varint_records_decode(blob) == payloads
    with pytest.raises(ValueError):
        varint_records_decode(blob[:-1])  # truncated payload
    with pytest.raises(ValueError):
        varint_records_decode(varint_encode(300)[:1])  # truncated header


def test_varint_scan_full_coverage(spark):
    import duckdb

    from graph_etl_pipeline_spark.queries.sources import src_varint_records_scan

    got = {
        r.c_custkey: (r.c_name, r.c_mktsegment)
        for r in src_varint_records_scan(spark, SF_SMOKE).collect()
    }
    src = {
        k: (n, m)
        for k, n, m in duckdb.sql(
            f"SELECT c_custkey, c_name, c_mktsegment"
            f" FROM '{SF_SMOKE}/customer.parquet'"
        ).fetchall()
    }
    assert got == src
