"""Sentence splitting (reference T1/T2, src/chunker/sentence-splitter.ts).

Reference behavior reproduced:
  * paragraphs pre-split on blank lines or newline-before-non-space
    (``\\n{2,}|\\n(?=\\S)``);
  * markdown headings are single sentences;
  * fenced code blocks are protected from splitting (placeholder swap);
  * sentence boundaries at ./!/? followed by whitespace.

The reference uses Intl.Segmenter (UAX#29); this is a regex approximation
(PyICU is not in the container) — the pipeline treats the splitter as a
pluggable pure function, so a UAX#29 implementation can drop in.

Runs as a plain Python function inside Arrow-batched pandas UDFs — the
per-document work is string processing, inherently row-local.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

_FENCE_RE = re.compile(r"```.*?```", re.DOTALL)
_PARA_RE = re.compile(r"\n{2,}|\n(?=\S)")
_HEADING_RE = re.compile(r"^#{1,6}\s")
_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_PLACEHOLDER = "\x00CODE{}\x00"


def split_sentences(text: str) -> list[str]:
    """Split one document into sentences; returns trimmed non-empty strings."""
    if not text:
        return []
    # protect fenced code blocks
    fences: list[str] = []

    def _stash(m: re.Match) -> str:
        fences.append(m.group(0))
        return _PLACEHOLDER.format(len(fences) - 1)

    protected = _FENCE_RE.sub(_stash, text)
    out: list[str] = []
    for para in _PARA_RE.split(protected):
        para = para.strip()
        if not para:
            continue
        if _HEADING_RE.match(para):
            out.append(para)
            continue
        for sent in _SENT_RE.split(para):
            sent = sent.strip()
            if sent:
                out.append(sent)
    # restore code blocks
    restored = []
    for s in out:
        for i, code in enumerate(fences):
            s = s.replace(_PLACEHOLDER.format(i), code)
        restored.append(s)
    return restored


@F.pandas_udf(ArrayType(StringType()))
def split_sentences_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: split_sentences(t or ""))


def split_sentence_units(
    text: str, atomic_ranges: list | None = None
) -> list[tuple[str, bool]]:
    """T2: split while preserving [start, end) spans as indivisible units
    (reference splitIntoSentenceUnits, sentence-splitter.ts:148-205).

    Ranges must be ordered, non-overlapping, in-bounds, and non-empty after
    trim — same validation, same errors, as the reference."""
    # atomic_ranges may arrive as a numpy array from Arrow — no truthiness
    ranges = (
        []
        if atomic_ranges is None or len(atomic_ranges) == 0
        else [(int(r[0]), int(r[1])) for r in atomic_ranges]
    )
    prev_end = 0
    for start, end in ranges:
        if not (0 <= start < end <= len(text)) or start < prev_end:
            raise ValueError(
                f"Invalid atomic range [{start}, {end}) for text length {len(text)}"
            )
        prev_end = end
    if not ranges:
        return [(s, False) for s in split_sentences(text)]
    units: list[tuple[str, bool]] = []
    cursor = 0
    for start, end in ranges:
        units.extend((s, False) for s in split_sentences(text[cursor:start]))
        atomic_text = text[start:end].strip()
        if not atomic_text:
            raise ValueError(f"Invalid atomic range [{start}, {end}): empty text")
        units.append((atomic_text, True))
        cursor = end
    units.extend((s, False) for s in split_sentences(text[cursor:]))
    return units


_UNITS_TYPE = ArrayType(
    StructType(
        [StructField("text", StringType()), StructField("atomic", BooleanType())]
    )
)


@F.pandas_udf(_UNITS_TYPE)
def split_units_udf(texts: pd.Series, ranges: pd.Series) -> pd.Series:
    return pd.Series(
        [
            split_sentence_units(t or "", r if r is not None else [])
            for t, r in zip(texts, ranges)
        ]
    )
