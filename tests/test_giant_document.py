"""Giant-document robustness: per-document fanout operators (span
explode, winnowing windows, token statistics) must handle one document
orders of magnitude larger than its neighbors — the single pathological
web page every crawl contains — with exact results and without a
per-partition blowup. 50k words ⇒ ~50k spans/grams from ONE row."""

from __future__ import annotations

import pytest

from graph_etl_pipeline_spark.io import TABLES
from graph_etl_pipeline_spark.registry import all_queries

GIANT_WORDS = 50_000


@pytest.fixture(scope="module")
def giant_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sf_giant")
    src = "/root/testdata/sf0.001"
    # vocabulary large enough that the giant doc's spans never repeat
    giant = " ".join(f"w{i}" for i in range(GIANT_WORDS))
    rows = [
        (0, giant, "en", "src0", len(giant)),
        (1, "small doc one two three four five six seven eight", "en", "src1", 49),
        (2, "another small doc with nine ten eleven twelve words", "en", "src2", 52),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    docs.write.mode("overwrite").parquet(str(root / "documents.parquet"))
    for name in TABLES:
        if name == "documents":
            continue
        df = spark.read.parquet(f"{src}/{name}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(root / f"{name}.parquet"))
    return str(root)


def test_span_explode_handles_giant_doc_exactly(spark, giant_sf_dir):
    from graph_etl_pipeline_spark.queries.dedup import SPAN_W

    df = all_queries()["dedup_ngram_spans"].fn(spark, giant_sf_dir)
    rows = {r.doc_id: r for r in df.collect()}
    g = rows[0]
    assert g.n_spans == GIANT_WORDS - (SPAN_W - 1)
    assert g.dup_spans == 0 and g.dup_permille == 0  # unique vocabulary


def test_winnowing_handles_giant_doc_with_theoretical_density(spark, giant_sf_dir):
    from graph_etl_pipeline_spark.queries.textops import WINNOW_K, WINNOW_W

    df = all_queries()["text_winnowing_fingerprint"].fn(spark, giant_sf_dir)
    g = {r.doc_id: r for r in df.collect()}[0]
    assert g.n_kgrams == GIANT_WORDS - (WINNOW_K - 1)
    # winnowing theory: expected density 2/(w+1); allow a wide band
    density = g.n_fingerprints / g.n_kgrams
    assert 0.2 < density < 0.5, density


def test_gopher_rules_word_count_cap_engages(spark, giant_sf_dir):
    df = all_queries()["text_gopher_rules"].fn(spark, giant_sf_dir)
    g = {r.doc_id: r for r in df.collect()}[0]
    assert g.n_words == GIANT_WORDS
    assert bool(g.r_word_count) is True  # 50k < the 100k ceiling
