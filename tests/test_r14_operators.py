"""Round-14 operator tests: the incremental cross-modal dedup closure."""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_pipeline_spark.registry import all_queries


def test_incremental_crossmodal_keeper_invariants(spark, sf_dir):
    """Same closure invariants the full composite guarantees
    (test_r13_operators.py): one row per document, exactly one keeper per
    cluster, canonical = component minimum, flags closed — the
    incremental path must not weaken any of them."""
    out = all_queries()["pipeline_incremental_crossmodal"].fn(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs

    kept_ids = {r.doc_id for r in out if r.kept}
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r.canonical_id, []).append(r)
    for canon, members in by_cluster.items():
        kept = [m for m in members if m.kept]
        assert len(kept) == 1, f"cluster {canon} keeps {len(kept)} rows"
        assert kept[0].doc_id == canon
        assert canon in kept_ids
        assert canon == min(m.doc_id for m in members)


def test_incremental_crossmodal_delta_merges_base_components(spark, tmp_path):
    """The case incrementality exists for: two components settled in
    YESTERDAY'S state ({1,2} lexical, {3,4} lexical) are merged by one
    new-batch document (id 5, the % INCR_NEW_MOD == 0 cohort) that is a
    lexical dup of 2 and a semantic dup of 3 — the contracted CC must
    route every member of both old components (and the new doc) to the
    global minimum 1, exercising label contraction, cross-modal union,
    and delta-vs-base pair generation in one scenario."""
    texts = {
        1: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        2: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        3: "one two three four five six seven eight nine ten eleven",
        4: "one two three four five six seven eight nine ten eleven",
        5: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        6: "completely unrelated text about parquet row groups and shuffle io",
    }
    docs = [(i, t, "en", "src0", len(t)) for i, t in texts.items()]
    sf = str(tmp_path)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    # embeddings: 3 and 5 identical (cos = 1 ≥ τ); everything else on
    # distinct axes so no other semantic pair verifies.
    def axis(i: int, scale: float = 1.0) -> list[float]:
        v = [0.0] * 64
        v[i % 64] = scale
        return v

    vecs = {1: axis(1), 2: axis(2), 3: axis(3), 4: axis(4), 5: axis(3), 6: axis(6)}
    spark.createDataFrame(
        [(i, v, 0) for i, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")

    out = {
        r.doc_id: (r.canonical_id, r.kept)
        for r in all_queries()["pipeline_incremental_crossmodal"].fn(spark, sf).collect()
    }
    # lexical base pairs: (1,2) and (3,4); delta doc 5 pairs lexically
    # with {1,2} and semantically with 3 → one merged component, min 1
    assert out[1] == (1, True)
    for i in (2, 3, 4, 5):
        assert out[i] == (1, False), f"doc {i}: {out[i]}"
    assert out[6] == (6, True)  # untouched singleton keeps itself
