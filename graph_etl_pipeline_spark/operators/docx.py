"""Minimal DOCX (ECMA-376 WordprocessingML) writer/text-extractor on the
stdlib only.

The reference's planned extraction inputs include DOCX container guides
("DOCX container guides → what-goes-in yes/no lists",
`/root/reference/etl_implementation.md:262-273`; `Source.type ∈
{pdf,csv,docx,llm}`, `src/db/schema.cql:96-98`) with no parser shipped.
This closes the last byte-format in that quartet (csv/json: q/sources.py,
xlsx: operators/xlsx.py, pdf: operators/pdf.py) the same way: speak the
public container format directly. A .docx is a zip of XML parts
(ECMA-376 part 1, WordprocessingML); the text-extraction subset is
`word/document.xml` → `<w:body>` → paragraphs `<w:p>` → runs `<w:r>` →
text nodes `<w:t>` plus `<w:tab/>` breaks.

Round-trip contract: paragraphs ↔ lines (`\\n`), tabs ↔ `<w:tab/>`,
leading/trailing/multiple spaces preserved via ``xml:space="preserve"``.
Each paragraph is split across MULTIPLE runs by the writer (as real Word
output is — runs fragment at every formatting boundary), so the reader's
run concatenation is exercised by every fixture. Control characters other
than tab are not representable in XML 1.0 and are rejected loudly.

Spark integration (`read_docx_dir`): identical shape to read_xlsx /
read_pdf_dir — `binaryFile` rows parsed executor-side in Arrow-batched
mapInPandas; a zip member is not splittable, so the unit of parallelism
is the file and the scale story is "many documents".
"""

from __future__ import annotations

import io
import os
import zipfile
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

RUN_CHARS = 40  # max chars per <w:r> — forces multi-run paragraphs


def _xml_escape(s: str) -> str:
    for ch in s:
        o = ord(ch)
        if o < 0x20 and ch != "\t":
            raise ValueError(
                f"control character {o:#04x} is not representable in XML 1.0 "
                "(WordprocessingML); only tab is supported inside a paragraph"
            )
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _para_xml(line: str) -> str:
    """One paragraph: tab-separated segments become <w:t>/<w:tab/> children,
    and each text segment is fragmented into RUN_CHARS-sized runs."""
    parts: list[str] = []
    for seg_i, seg in enumerate(line.split("\t")):
        if seg_i:
            parts.append("<w:r><w:tab/></w:r>")
        for i in range(0, len(seg), RUN_CHARS) or [0]:
            chunk = seg[i : i + RUN_CHARS]
            parts.append(
                f'<w:r><w:t xml:space="preserve">{_xml_escape(chunk)}</w:t></w:r>'
            )
    return f"<w:p>{''.join(parts)}</w:p>"


def build_docx(text: str) -> bytes:
    """Serialize `text` as a complete WordprocessingML package: one
    paragraph per line, tabs as <w:tab/>, multi-run fragmentation.
    extract round-trips exactly (for text free of non-tab controls)."""
    paras = "".join(_para_xml(line) for line in text.split("\n"))
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W[1:-1]}"><w:body>{paras}</w:body></w:document>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/word/document.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
        "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_PKG_REL_NS[1:-1]}">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="word/document.xml"/></Relationships>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("word/document.xml", document)
    return buf.getvalue()


def parse_docx(data: bytes) -> tuple[str, int]:
    """Parse .docx bytes → (text, paragraph count). Resolves the document
    part through the package relationships (not a hard-coded path), then
    walks body paragraphs concatenating run text and tabs."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        doc_part = "word/document.xml"
        if "_rels/.rels" in z.namelist():
            for rel in ET.fromstring(z.read("_rels/.rels")).iter(
                f"{_PKG_REL_NS}Relationship"
            ):
                if rel.get("Type", "").endswith("/officeDocument"):
                    doc_part = rel.get("Target").lstrip("/")
        if doc_part not in z.namelist():
            raise ValueError(f"not a DOCX package: missing {doc_part}")
        root = ET.fromstring(z.read(doc_part))
    body = root.find(f"{_W}body")
    if body is None:
        raise ValueError("malformed DOCX: document has no <w:body>")
    lines: list[str] = []
    for p in body.iter(f"{_W}p"):
        pieces: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W}t":
                pieces.append(node.text or "")
            elif node.tag == f"{_W}tab":
                pieces.append("\t")
        lines.append("".join(pieces))
    return "\n".join(lines), len(lines)


DOCX_SCAN_SCHEMA = "path string, text string, n_paragraphs int"


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        paths, texts, nparas = [], [], []
        for path, content in zip(pdf["path"], pdf["content"]):
            text, n = parse_docx(bytes(content))
            paths.append(path)
            texts.append(text)
            nparas.append(n)
        yield pd.DataFrame({"path": paths, "text": texts, "n_paragraphs": nparas})


def read_docx_dir(spark: SparkSession, path: str) -> DataFrame:
    """Distributed DOCX text extraction: binaryFile scan over *.docx, one
    row per file, parsed executor-side in Arrow-batched mapInPandas."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.docx")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_parse_batches, schema=DOCX_SCAN_SCHEMA)
