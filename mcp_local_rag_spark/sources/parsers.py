"""Per-format parsers + title extraction (reference S6/T7/T14,
src/parser/index.ts:272-289, src/parser/title-extractor.ts).

MD/TXT are fully implemented. PDF (mupdf positions + header/footer
filtering), DOCX (mammoth HTML walker + table atomic ranges), and HTML
(Readability + Turndown) need native libs not present in this container —
their Spark-side plumbing (dispatch, schema, batch shape) is real, the
decode step is stubbed behind import-tries that raise a clear
NotImplementedError, matching the brief's multimodal-stub guidance.

Parsers run inside ``mapInPandas`` over (path, content) binary rows — the
bytes never leave the executor.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

_FRONTMATTER_RE = re.compile(r"\A---\s*\n(.*?)\n---\s*\n", re.DOTALL)
_FM_TITLE_RE = re.compile(r"^title:\s*[\"']?(.+?)[\"']?\s*$", re.MULTILINE)
_H1_RE = re.compile(r"^#\s+(.+?)\s*$", re.MULTILINE)


def _filename_title(path: str) -> str:
    name = path.rsplit("/", 1)[-1]
    return name.rsplit(".", 1)[0] if "." in name else name


def extract_md_title(text: str, path: str) -> str:
    """MD priority chain: frontmatter title -> first H1 -> filename
    (reference src/parser/title-extractor.ts:54-69)."""
    fm = _FRONTMATTER_RE.match(text)
    if fm:
        m = _FM_TITLE_RE.search(fm.group(1))
        if m:
            return m.group(1).strip()
    m = _H1_RE.search(text)
    if m:
        return m.group(1).strip()
    return _filename_title(path)


def extract_txt_title(text: str, path: str) -> str:
    """TXT: first line iff followed by a blank line; else filename
    (reference src/parser/title-extractor.ts:79-97)."""
    lines = text.split("\n")
    if len(lines) >= 2 and lines[0].strip() and not lines[1].strip():
        return lines[0].strip()
    return _filename_title(path)


def parse_text_bytes(path: str, content: bytes) -> dict:
    """Parse one md/txt file: {text, title, atomic_ranges}."""
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    text = content.decode("utf-8", errors="replace")
    if ext == "md":
        title = extract_md_title(text, path)
    elif ext == "txt":
        title = extract_txt_title(text, path)
    elif ext == "pdf":
        raise NotImplementedError(
            "PDF parsing needs pymupdf (not in container); plumbing is ready —"
            " structured text + position extraction per reference"
            " src/parser/pdf-extract.ts, header/footer filter per pdf-filter.ts"
        )
    elif ext == "docx":
        raise NotImplementedError(
            "DOCX parsing needs a docx reader (not in container); table rows"
            " become atomic ranges per reference src/parser/docx-parser.ts:166-190"
        )
    elif ext in ("html", "htm"):
        raise NotImplementedError(
            "HTML parsing needs readability-lxml (not in container); reference"
            " src/parser/html-parser.ts:69-130"
        )
    else:
        raise ValueError(f"unsupported extension: {path}")
    return {"text": text, "title": title}


PARSED_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("parse_error", StringType()),
    ]
)


def parse_files(files: DataFrame) -> DataFrame:
    """(path, content) -> (path, text, title, parse_error); unparseable files
    carry the error instead of failing the job (coverage, not crash)."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                try:
                    parsed = parse_text_bytes(path, bytes(content))
                    rows.append((path, parsed["text"], parsed["title"], None))
                except (NotImplementedError, ValueError, UnicodeDecodeError) as e:
                    rows.append((path, None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["path", "text", "title", "parse_error"])

    return files.select("path", "content").mapInPandas(_parse, PARSED_SCHEMA)
