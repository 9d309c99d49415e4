"""PDF byte-format ingestion (operators/pdf.py): writer↔reader round trip
incl. escape/octal/unicode edge cases, real binaryFile directory scans,
page-tree structure checks, and malformed-input error paths."""

from __future__ import annotations

import math
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graph_etl_pipeline_spark.operators.pdf import (
    CHUNK_BYTES,
    LINES_PER_PAGE,
    build_pdf,
    parse_pdf,
    read_pdf_dir,
)


def expected_pages(text: str) -> int:
    nb = len(text.encode("utf-8"))
    chunks = max(1, math.ceil(nb / CHUNK_BYTES))
    return max(1, math.ceil(chunks / LINES_PER_PAGE))


EDGE_CASES = [
    "",
    "hello world",
    "parens (nested (deep)) and \\ backslash \\( mixed",
    "unicode: héllo wörld — ✓ 日本語 🙂",
    "control chars\nand\ttabs\r\nand\x00nul",
    ")" * 60 + "(" * 60,
    "x" * (CHUNK_BYTES * LINES_PER_PAGE * 3 + 1),  # forces 4 pages
]


@pytest.mark.parametrize("text", EDGE_CASES, ids=range(len(EDGE_CASES)))
def test_round_trip_exact(text):
    out, n_pages = parse_pdf(build_pdf(text))
    assert out == text
    assert n_pages == expected_pages(text)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=400))
def test_round_trip_property(text):
    out, n_pages = parse_pdf(build_pdf(text))
    assert out == text
    assert n_pages == expected_pages(text)


def test_file_structure_is_viewer_valid():
    """Spot-check the invariants a real viewer needs: header magic, xref
    offsets that actually point at their objects, trailer startxref."""
    data = build_pdf("structure check " * 20)
    assert data.startswith(b"%PDF-1.4\n")
    assert data.rstrip().endswith(b"%%EOF")
    xref_at = int(data.rsplit(b"startxref\n", 1)[1].split(b"\n", 1)[0])
    assert data[xref_at : xref_at + 4] == b"xref"
    # every in-use xref entry points at "<num> 0 obj"
    table = data[xref_at:].split(b"\n")
    entries = [ln for ln in table if ln.endswith(b" n ")]
    assert entries, "no in-use xref entries"
    for i, ln in enumerate(entries, start=1):
        off = int(ln.split(b" ", 1)[0])
        assert data[off:].startswith(b"%d 0 obj" % i)


def test_non_content_streams_do_not_leak():
    """The extractor must walk /Root→/Pages→/Kids→/Contents, not grep all
    streams: an orphan stream object containing decoy text must not appear."""
    data = build_pdf("real payload")
    decoy = b"9 0 obj\n<< /Length 20 >>\nstream\nBT (DECOY) Tj ET\nendstream\nendobj\n"
    # splice the orphan object before the xref (offsets of real objects keep
    # working because the parser scans objects, not the xref table)
    at = data.find(b"xref")
    spliced = data[:at] + decoy + data[at:]
    text, n_pages = parse_pdf(spliced)
    assert text == "real payload"
    assert "DECOY" not in text
    assert n_pages == 1


@pytest.mark.parametrize(
    "data",
    [b"", b"not a pdf at all", b"%PDF-1.4\nno objects here\n%%EOF"],
    ids=["empty", "garbage", "no-root"],
)
def test_malformed_rejected(data):
    with pytest.raises(ValueError):
        parse_pdf(data)


def test_read_pdf_dir_binary_file_scan(spark, tmp_path):
    """End-to-end binaryFile ingestion: write real .pdf files to disk, scan
    the directory distributed, extract text executor-side."""
    docs = {
        f"doc{i:02d}": f"document {i} body " + "word " * (i * 17)
        for i in range(8)
    }
    for name, text in docs.items():
        (tmp_path / f"{name}.pdf").write_bytes(build_pdf(text))
    # a non-pdf file in the same dir must be ignored by the glob
    (tmp_path / "notes.txt").write_bytes(b"not a pdf")

    rows = read_pdf_dir(spark, str(tmp_path)).collect()
    assert len(rows) == len(docs)
    for r in rows:
        name = os.path.splitext(os.path.basename(r.path))[0]
        assert r.text == docs[name]
        assert r.n_pages == expected_pages(docs[name])


@pytest.mark.parametrize("text", EDGE_CASES, ids=range(len(EDGE_CASES)))
def test_round_trip_exact_flate(text):
    """FlateDecode path (VERDICT r7 #4): compressed content streams must
    round-trip byte-exactly, and the file must actually carry the filter
    (smaller/different bytes than the raw form, /FlateDecode tagged)."""
    blob = build_pdf(text, compress=True)
    assert b"/Filter /FlateDecode" in blob
    out, n_pages = parse_pdf(blob)
    assert out == text
    assert n_pages == expected_pages(text)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=400))
def test_round_trip_property_flate(text):
    out, n_pages = parse_pdf(build_pdf(text, compress=True))
    assert out == text
    assert n_pages == expected_pages(text)


def test_truncated_deflate_raises_not_partial():
    """A corrupt/truncated deflate body must raise (ValueError with the
    malformed marker), never silently yield partial text."""
    import re as _re

    blob = build_pdf("the quick brown fox jumps over the lazy dog " * 8, compress=True)
    m = _re.search(rb"/Length (\d+) /Filter /FlateDecode >>\nstream\n", blob)
    assert m is not None
    start, length = m.end(), int(m.group(1))
    # chop the deflate body in half, fix up /Length so delimiting still works
    cut = length // 2
    trunc = (
        blob[: m.start()]
        + b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % cut
        + blob[start : start + cut]
        + blob[start + length :]
    )
    with pytest.raises(ValueError, match="malformed FlateDecode"):
        parse_pdf(trunc)


def test_flate_mixed_directory_scan(spark, tmp_path):
    """binaryFile directory scan over a MIX of raw and Flate-compressed
    files — the reader must not care which codec each file used."""
    texts = {"a": "raw text body", "b": "compressed text body " * 10}
    (tmp_path / "a.pdf").write_bytes(build_pdf(texts["a"], compress=False))
    (tmp_path / "b.pdf").write_bytes(build_pdf(texts["b"], compress=True))
    rows = {
        os.path.basename(r.path)[0]: r.text
        for r in read_pdf_dir(spark, str(tmp_path)).collect()
    }
    assert rows == texts


def test_indirect_multidigit_length_falls_back_to_endstream_scan():
    """ADVICE r8: '/Length 123 0 R' (indirect ref, object number >= 10) must
    NOT backtrack-match a bogus direct length of '12' — the reader has to
    fall back to the endstream scan and recover the full payload."""
    import re as _re

    text = "indirect length payload " * 6
    blob = build_pdf(text)
    m = _re.search(rb"<< /Length (\d+) >>\nstream\n", blob)
    assert m is not None
    patched = (
        blob[: m.start()]
        + b"<< /Length 123 0 R >>\nstream\n"
        + blob[m.end() :]
    )
    out, n_pages = parse_pdf(patched)
    assert out == text
    assert n_pages == expected_pages(text)


def test_solo_array_flate_filter_still_inflates():
    """'/Filter [/FlateDecode]' (single-element array form) is equivalent to
    the bare name and must inflate."""
    text = "array filter body " * 10
    blob = build_pdf(text, compress=True)
    patched = blob.replace(
        b"/Filter /FlateDecode", b"/Filter [ /FlateDecode ]"
    )
    out, _ = parse_pdf(patched)
    assert out == text


def test_unsupported_filter_chain_raises_not_garbage():
    """ADVICE r8: a filter CHAIN like [/FlateDecode /ASCIIHexDecode] is not
    supported — the reader must raise, never tokenize still-encoded bytes."""
    blob = build_pdf("chained filter body " * 10, compress=True)
    patched = blob.replace(
        b"/Filter /FlateDecode",
        b"/Filter [/FlateDecode /ASCIIHexDecode]",
    )
    with pytest.raises(ValueError, match="unsupported PDF stream filter"):
        parse_pdf(patched)


def test_unsupported_single_foreign_filter_raises():
    """A lone non-Flate filter (/LZWDecode) must raise the same way."""
    blob = build_pdf("lzw body " * 10, compress=True)
    patched = blob.replace(b"/Filter /FlateDecode", b"/Filter /LZWDecode")
    with pytest.raises(ValueError, match="unsupported PDF stream filter"):
        parse_pdf(patched)
