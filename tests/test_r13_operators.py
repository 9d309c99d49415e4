"""Round-13 operator tests: the SemDeDup apply composite and the
token-histogram drift monitor."""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F

from graph_etl_pipeline_spark.registry import all_queries


def test_semdedup_apply_keeper_invariants(spark, sf_dir):
    """The semantic composite's flags must be CLOSED (every canonical_id
    references a kept row), cover the full embedding corpus one row per
    vector, keep exactly one member per duplicate cluster, and never
    keep FEWER vectors than the greedy per-cluster flags drop (CC merges
    greedy clusters, it cannot split them)."""
    specs = all_queries()
    out = specs["pipeline_semdedup_apply"].fn(spark, sf_dir).collect()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    assert len(out) == n_vecs  # one row per input vector, no drops
    kept_ids = {r.vec_id for r in out if r.kept}
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.canonical_id, []).append(r)
    for canon, members in by_cluster.items():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1, f"cluster {canon} keeps {len(kept)} rows"
        assert kept[0].vec_id == canon  # canonical = component minimum, kept
        assert canon in kept_ids  # closed: canonicals are surviving rows
        assert canon == min(m.vec_id for m in members)

    greedy = specs["dedup_semdedup_clusters"].fn(spark, sf_dir).collect()
    greedy_dropped = {r.vec_id for r in greedy if not r.keep}
    cc_dropped = {r.vec_id for r in out if not r.kept}
    # CC canonicalization drops a superset-or-equal of the greedy rule's
    # drop set restricted to pair-graph members: every greedy drop sits
    # in some verified pair, so its component has >1 member and only the
    # minimum survives. (The reverse is false: CC may drop a component
    # minimum's higher-id peers the greedy rule kept via chain breaks.)
    assert greedy_dropped <= cc_dropped


def test_token_drift_exact_counts_and_statistic(spark, sf_dir):
    """The hashed histogram must partition the exploded token stream
    (Σ(o_a+o_b) = total tokens), the num/den strings must be the exact
    int128 χ² pieces recomputable from the emitted counts, and the
    statistic must be finite and non-negative."""
    from graph_etl_pipeline_spark.functions.text import norm_tokens
    from graph_etl_pipeline_spark.queries.textops import TOKEN_DRIFT_BUCKETS

    specs = all_queries()
    rows = specs["text_token_drift"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= TOKEN_DRIFT_BUCKETS
    assert all(0 <= r.bucket < TOKEN_DRIFT_BUCKETS for r in rows)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = docs.select(F.explode(norm_tokens(F.col("text")))).count()
    assert sum(r.o_a + r.o_b for r in rows) == n_tokens

    na = sum(r.o_a for r in rows)
    nb = sum(r.o_b for r in rows)
    chi2 = Fraction(0)
    for r in rows:
        absdiff = abs(r.o_a * nb - r.o_b * na)
        den = (r.o_a + r.o_b) * na * nb
        # exact integer pieces, no float echo (unsquared per ADVICE r13 #4)
        assert str(absdiff) == r.chi2_absdiff
        assert str(den) == r.chi2_den
        chi2 += Fraction(absdiff * absdiff, den)
    assert chi2 >= 0


def test_token_drift_detects_planted_shift(spark, tmp_path):
    """Plant a vocabulary shift (second half of the corpus speaks a
    disjoint vocabulary) and require the χ² statistic to exceed the
    no-shift statistic on an identical-vocabulary corpus — the monitor
    must actually move when the thing it monitors changes."""
    from graph_etl_pipeline_spark.registry import all_queries

    def corpus(path, shifted: bool) -> str:
        rows = []
        for i in range(200):
            if shifted and i >= 100:
                text = "zulu xray yankee " * 5
            else:
                text = "alpha bravo charlie " * 5
            rows.append((i, text.strip(), "en", "src0", len(text)))
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
        return str(path)

    def stat(sf) -> float:
        rows = all_queries()["text_token_drift"].fn(spark, sf).collect()
        return float(
            sum(
                Fraction(int(r.chi2_absdiff) ** 2, int(r.chi2_den))
                for r in rows
            )
        )

    shifted = stat(corpus(tmp_path / "shifted", True))
    flat = stat(corpus(tmp_path / "flat", False))
    assert flat == 0.0  # identical halves: every bucket's numerator is 0
    assert shifted > 100  # disjoint vocabularies: near the χ² maximum


def test_crossmodal_closure_strictly_merges_both_graphs(spark, sf_dir):
    """The cross-modal closure must (a) cover the corpus one row per
    document, (b) keep exactly the component minimum per cluster, and
    (c) be at least as strict as BOTH single-modality composites: every
    document dropped by the lexical composite or by the semantic
    composite is also dropped by the closure (unioning edges can only
    grow components, never split them)."""
    specs = all_queries()
    out = specs["pipeline_crossmodal_dedup"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs

    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.canonical_id, []).append(r)
    for canon, members in by_cluster.items():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1 and kept[0].doc_id == canon == min(
            m.doc_id for m in members
        )

    dropped = {r.doc_id for r in out if not r.kept}
    lex = specs["pipeline_minhash_verified_dedup"].fn(spark, sf_dir).collect()
    sem = specs["pipeline_semdedup_apply"].fn(spark, sf_dir).collect()
    lex_dropped = {r.doc_id for r in lex if not r.kept}
    sem_dropped = {r.vec_id for r in sem if not r.kept}
    assert lex_dropped <= dropped
    assert sem_dropped <= dropped


def test_clustering_coefficient_exact_pieces(spark, sf_dir):
    """The rational pieces must be recomputable from the emitted
    degree/triangle counts, the coefficient must be exactly
    c_num/c_den (one IEEE division) with the degree<2 guard, every
    coefficient must lie in [0, 1], and the per-vertex triangle credits
    must sum to exactly 3x the global triangle count."""
    specs = all_queries()
    rows = specs["graph_clustering_coefficient"].fn(spark, sf_dir).collect()
    assert rows
    total = specs["graph_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert sum(r.triangles for r in rows) == 3 * total.n_triangles
    for r in rows:
        assert r.c_num == 2 * r.triangles
        assert r.c_den == r.degree * (r.degree - 1)
        if r.degree >= 2:
            assert r.coeff == r.c_num / r.c_den  # same IEEE division
            assert 0.0 <= r.coeff <= 1.0
        else:
            assert r.coeff == 0.0 and r.triangles == 0


def test_profile_drift_detects_planted_null_spike(spark, tmp_path):
    """Plant a null-rate spike in the second half (props goes 0% -> 50%
    null) and require the monitor's exact ppm pieces to move from equal
    to a 500000-ppm gap, while the untouched columns stay flat."""
    import datetime

    rows = []
    base = datetime.datetime(2024, 1, 1)
    for i in range(400):
        late = i >= 200
        props = None if (late and i % 2 == 0) else f"p{i}"
        rows.append((i, base + datetime.timedelta(minutes=i), i % 7, "click", 1.0, props))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")

    out = {
        r.column_name: r
        for r in all_queries()["dq_profile_drift"].fn(spark, str(tmp_path)).collect()
    }
    p = out["props"]
    assert p.null_ppm_a == 0
    assert p.null_ppm_b == 500000
    assert p.nn_a == p.n_a and p.nn_b * 2 == p.n_b
    for c in ("user_id", "event_type", "cents"):
        assert out[c].null_ppm_a == out[c].null_ppm_b == 0
