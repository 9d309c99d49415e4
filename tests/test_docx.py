"""DOCX byte-format ingestion (operators/docx.py): writer↔reader round
trip with paragraph/run/tab edge cases, binaryFile directory scans, and
malformed-package error paths."""

from __future__ import annotations

import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graph_etl_pipeline_spark.operators.docx import (
    RUN_CHARS,
    build_docx,
    parse_docx,
    read_docx_dir,
)

EDGE_CASES = [
    "",
    "hello world",
    "multi\nline\ntext with\ttabs",
    "  leading, trailing  and  double  spaces  ",
    "x" * (RUN_CHARS * 3 + 7),  # forces 4 runs in one paragraph
    "unicode é ✓ 日本語 & <tags> \"quotes\" 'apos'",
    "\t\tleading tabs\n\nempty paragraph above",
]


@pytest.mark.parametrize("text", EDGE_CASES, ids=range(len(EDGE_CASES)))
def test_round_trip_exact(text):
    out, n_paragraphs = parse_docx(build_docx(text))
    assert out == text
    assert n_paragraphs == text.count("\n") + 1


# XML 1.0 cannot carry control chars other than \t (and the line
# separators the paragraph split consumes) — generate everything else
_docx_text = st.text(max_size=300).filter(
    lambda s: all(ord(c) >= 0x20 or c in "\t\n" for c in s)
)


@settings(max_examples=200, deadline=None)
@given(_docx_text)
def test_round_trip_property(text):
    out, n_paragraphs = parse_docx(build_docx(text))
    assert out == text
    assert n_paragraphs == text.count("\n") + 1


def test_multi_run_fragmentation():
    """Writer must fragment long paragraphs into RUN_CHARS-sized runs (the
    shape real Word output has) — reader concatenates them."""
    data = build_docx("a" * (RUN_CHARS * 2 + 5))
    import io
    import zipfile

    with zipfile.ZipFile(io.BytesIO(data)) as z:
        xml = z.read("word/document.xml").decode()
    assert xml.count("<w:r>") == 3


def test_control_chars_rejected():
    with pytest.raises(ValueError):
        build_docx("bell \x07")


@pytest.mark.parametrize(
    "data",
    [b"", b"PK\x03\x04 not a zip really", b"plain text"],
    ids=["empty", "fake-zip", "text"],
)
def test_malformed_rejected(data):
    with pytest.raises(Exception):
        parse_docx(data)


def test_read_docx_dir_binary_file_scan(spark, tmp_path):
    docs = {
        f"guide{i}": f"container guide {i}\n" + "yes\tglass\nno\tfoil " * (i + 1)
        for i in range(6)
    }
    for name, text in docs.items():
        (tmp_path / f"{name}.docx").write_bytes(build_docx(text))
    (tmp_path / "ignore.txt").write_bytes(b"not a docx")

    rows = read_docx_dir(spark, str(tmp_path)).collect()
    assert len(rows) == len(docs)
    for r in rows:
        name = os.path.splitext(os.path.basename(r.path))[0]
        assert r.text == docs[name]
        assert r.n_paragraphs == docs[name].count("\n") + 1
