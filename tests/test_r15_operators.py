"""Round-15 operator tests: the retrain boundary of the incremental
cross-modal family (VERDICT r14 #7)."""

from __future__ import annotations

from graph_etl_pipeline_spark.registry import all_queries


def test_retrain_boundary_artifact_invalidation(spark, sf_dir):
    """The structural half of the retrain contract: rebuilding the
    quantizer must land the retrained model's semantic pair artifacts at
    NEW content addresses (never aliasing the frozen model's), while
    every lexical pair artifact — full set and base/delta split alike —
    keeps its address, because shingles and Jaccard verification never
    see the quantizer. This is what makes 'retrain invalidates the
    semantic artifacts and nothing else' true without any bookkeeping."""
    from graph_etl_pipeline_spark.queries.dedup import (
        _incr_lexical_pairs,
        _lsh_pairs_artifact,
    )
    from graph_etl_pipeline_spark.queries.similarity import (
        _incr_semantic_pairs,
        _semdedup_verified_pairs,
    )

    # yesterday: frozen-model artifacts + the corpus's lexical artifacts
    lex_b, lex_d = _incr_lexical_pairs(spark, sf_dir)
    sem_b, sem_d = _incr_semantic_pairs(spark, sf_dir)
    frozen_sem = set(sem_b.inputFiles()) | set(sem_d.inputFiles())
    lex_before = (
        set(lex_b.inputFiles())
        | set(lex_d.inputFiles())
        | set(_lsh_pairs_artifact(spark, sf_dir).inputFiles())
    )
    assert frozen_sem and lex_before

    # the retrain: build the full-corpus model's verified pair artifact
    retrained_sem = set(_semdedup_verified_pairs(spark, sf_dir).inputFiles())
    assert retrained_sem
    assert frozen_sem.isdisjoint(retrained_sem), (
        "retrained semantic artifacts must not alias the frozen model's"
    )

    # the lexical artifacts survive the boundary: identical addresses
    lex_b2, lex_d2 = _incr_lexical_pairs(spark, sf_dir)
    lex_after = (
        set(lex_b2.inputFiles())
        | set(lex_d2.inputFiles())
        | set(_lsh_pairs_artifact(spark, sf_dir).inputFiles())
    )
    assert lex_after == lex_before


def test_retrain_reconciliation_consistent_with_parents(spark, sf_dir):
    """The reconciliation must be EXACTLY its two parents joined on
    doc_id — frozen columns from the incremental closure, retrained
    columns from the full crossmodal closure, changed = any disagreement
    — and cover every document exactly once."""
    qs = all_queries()
    rec = {r.doc_id: r for r in qs["pipeline_crossmodal_retrain"].fn(spark, sf_dir).collect()}
    frozen = {r.doc_id: r for r in qs["pipeline_incremental_crossmodal"].fn(spark, sf_dir).collect()}
    retrained = {r.doc_id: r for r in qs["pipeline_crossmodal_dedup"].fn(spark, sf_dir).collect()}
    assert set(rec) == set(frozen) == set(retrained)
    for doc_id, r in rec.items():
        f, t = frozen[doc_id], retrained[doc_id]
        assert (r.kept_frozen, r.canonical_frozen) == (f.kept, f.canonical_id)
        assert (r.kept_retrained, r.canonical_retrained) == (t.kept, t.canonical_id)
        assert r.changed == (
            (f.kept != t.kept) or (f.canonical_id != t.canonical_id)
        )
