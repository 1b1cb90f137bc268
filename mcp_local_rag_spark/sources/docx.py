"""Stdlib DOCX parser — no native libs.

A .docx file is a zip of OOXML parts; ``word/document.xml`` holds the body
and ``docProps/core.xml`` the Dublin-Core metadata. This reproduces the
reference's DOCX semantics (mammoth HTML + block walker,
src/parser/docx-parser.ts:120-290) directly from the OOXML:

  * paragraphs -> prose blocks (whitespace-normalized single lines);
  * consecutive numbered paragraphs -> one list block, one item per line
    (mammoth's ul/li + serializeList, docx-parser.ts:76-118);
  * supported tables (>= 2 rows, uniform column count, no
    gridSpan/vMerge, no nested table) -> one ATOMIC block per data row,
    "Header: value" lines, first physical row as labels, empty header
    cells named "Column N" (docx-parser.ts:164-189);
  * unsupported tables -> all text tokens space-joined, non-atomic
    (docx-parser.ts:168-170);
  * content = blocks joined by blank lines; atomic [start, end) character
    ranges returned for the table-row blocks (convertDocxDocumentToText,
    docx-parser.ts:262-278);
  * title chain: core.xml dc:title -> first Heading-1 paragraph ->
    filename (title-extractor.ts:173-190).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
DC_TITLE = "{http://purl.org/dc/elements/1.1/}title"

_WS_RE = re.compile(r"\s+")


def _norm_line(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


def _paragraph_text(p: ET.Element) -> str:
    """Concatenate run text; w:br/w:cr -> space, w:tab -> space."""
    parts: list[str] = []
    for el in p.iter():
        tag = el.tag
        if tag == f"{W_NS}t":
            parts.append(el.text or "")
        elif tag in (f"{W_NS}br", f"{W_NS}cr", f"{W_NS}tab"):
            parts.append(" ")
    return _norm_line("".join(parts))


def _paragraph_style(p: ET.Element) -> str:
    el = p.find(f"{W_NS}pPr/{W_NS}pStyle")
    return (el.get(f"{W_NS}val") or "") if el is not None else ""


def _is_list_item(p: ET.Element) -> bool:
    return p.find(f"{W_NS}pPr/{W_NS}numPr") is not None


def _is_heading1(style: str) -> bool:
    return style.replace(" ", "").lower() in ("heading1", "berschrift1", "title")


def _cell_has_span(tc: ET.Element) -> bool:
    pr = tc.find(f"{W_NS}tcPr")
    if pr is None:
        return False
    grid = pr.find(f"{W_NS}gridSpan")
    if grid is not None:
        try:
            if int(grid.get(f"{W_NS}val") or "1") > 1:
                return True
        except ValueError:
            return True
    return pr.find(f"{W_NS}vMerge") is not None


def _table_blocks(tbl: ET.Element) -> list[tuple[str, bool]]:
    """Reference emitTable: header-labeled atomic rows, or flattened text."""
    rows = [tr for tr in tbl if tr.tag == f"{W_NS}tr"]
    row_cells = [[tc for tc in tr if tc.tag == f"{W_NS}tc"] for tr in rows]

    def _cell_text(tc: ET.Element) -> str:
        return _norm_line(
            " ".join(_paragraph_text(p) for p in tc.iter(f"{W_NS}p"))
        )

    # iter() includes the table element itself: > 1 means a nested table
    nested = sum(1 for _ in tbl.iter(f"{W_NS}tbl")) > 1
    n_cols = len(row_cells[0]) if row_cells else 0
    supported = (
        not nested
        and len(rows) >= 2
        and n_cols > 0
        and all(len(cells) == n_cols for cells in row_cells)
        and not any(_cell_has_span(tc) for cells in row_cells for tc in cells)
    )
    if not supported:
        text = _norm_line(" ".join(_paragraph_text(p) for p in tbl.iter(f"{W_NS}p")))
        return [(text, False)] if text else []

    headers = [
        _cell_text(tc) or f"Column {i + 1}" for i, tc in enumerate(row_cells[0])
    ]
    blocks: list[tuple[str, bool]] = []
    for cells in row_cells[1:]:
        text = "\n".join(
            f"{headers[i]}: {_cell_text(tc)}" for i, tc in enumerate(cells)
        )
        if text:
            blocks.append((text, True))
    return blocks


def _body_blocks(body: ET.Element) -> tuple[list[tuple[str, bool]], str | None]:
    """Emit (text, atomic) blocks in document order; also first Heading-1."""
    blocks: list[tuple[str, bool]] = []
    first_h1: str | None = None
    pending_list: list[str] = []

    def _flush_list() -> None:
        nonlocal pending_list
        if pending_list:
            blocks.append(("\n".join(pending_list), False))
            pending_list = []

    for el in body:
        if el.tag == f"{W_NS}p":
            text = _paragraph_text(el)
            if _is_list_item(el):
                if text:
                    pending_list.append(text)
                continue
            _flush_list()
            if not text:
                continue
            if first_h1 is None and _is_heading1(_paragraph_style(el)):
                first_h1 = text
            blocks.append((text, False))
        elif el.tag == f"{W_NS}tbl":
            _flush_list()
            blocks.extend(_table_blocks(el))
    _flush_list()
    return blocks, first_h1


def _core_title(zf: zipfile.ZipFile) -> str | None:
    try:
        xml = zf.read("docProps/core.xml")
    except KeyError:
        return None
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return None
    el = root.find(DC_TITLE)
    title = _norm_line(el.text or "") if el is not None else ""
    return title or None


def filename_title(path: str) -> str:
    """Reference fileNameToTitle: strip extension, [-_] -> spaces
    (title-extractor.ts:34-40)."""
    name = path.rsplit("/", 1)[-1]
    dot = name.rfind(".")
    if dot > 0:
        name = name[:dot]
    return name.replace("-", " ").replace("_", " ")


def parse_docx_bytes(path: str, content: bytes) -> dict:
    """-> {text, title, atomic_ranges: [[start, end), ...]}."""
    with zipfile.ZipFile(BytesIO(content)) as zf:
        doc_xml = zf.read("word/document.xml")
        meta_title = _core_title(zf)
    root = ET.fromstring(doc_xml)
    body = root.find(f"{W_NS}body")
    blocks, first_h1 = _body_blocks(body) if body is not None else ([], None)

    content_parts: list[str] = []
    atomic_ranges: list[list[int]] = []
    pos = 0
    for text, atomic in blocks:
        if content_parts:
            content_parts.append("\n\n")
            pos += 2
        start = pos
        content_parts.append(text)
        pos += len(text)
        if atomic:
            atomic_ranges.append([start, pos])

    title = meta_title or first_h1 or filename_title(path)
    return {
        "text": "".join(content_parts),
        "title": title,
        "atomic_ranges": atomic_ranges,
    }
