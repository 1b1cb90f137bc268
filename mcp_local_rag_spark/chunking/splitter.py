"""Sentence splitting (reference T1/T2, src/chunker/sentence-splitter.ts).

Reference behavior reproduced:
  * paragraphs pre-split on blank lines, newline-before-non-space, or a
    newline right after a code placeholder
    (``\\n{2,}|\\n(?=\\S)|(?<=\\u0000)\\n``, sentence-splitter.ts:117);
  * markdown headings are single sentences;
  * fenced AND inline code are protected from splitting (placeholder
    swap-out/in, sentence-splitter.ts:42-82);
  * sentence boundaries per a UAX#29 approximation (the reference uses
    ``Intl.Segmenter('und')``; PyICU is not in the container):
      - Latin terminators ``.!?…`` plus trailing close-punctuation,
        followed by whitespace;
      - CJK full-width terminators ``。！？；…`` plus close-quotes/brackets,
        with NO whitespace required — no-space scripts split correctly
        (the very case the reference's ngram FTS exists for,
        src/vectordb/index.ts:258-271);
      - abbreviation guard (Mr./Dr./e.g./single initials) suppresses false
        Latin breaks — strictly fewer spurious fragments than the
        reference, which documents abbreviation splits as acceptable noise.

The pipeline treats the splitter as a pluggable pure function, so a full
ICU implementation can drop in.

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

# PyICU import-try (same pattern as the pymupdf gate in sources/parsers):
# when importable, icu.BreakIterator provides true UAX#29 sentence
# segmentation with dictionary support — exact parity with the
# reference's Intl.Segmenter('und') (src/chunker/sentence-splitter.ts:90),
# closing the unspaced-SEA divergence the stdlib scanner documents below.
# The stdlib scanner remains the fallback and the tested-everywhere path.
try:
    import icu as _icu
except ImportError:  # pragma: no cover - container has no PyICU
    _icu = None

_FENCE_RE = re.compile(r"```.*?```", re.DOTALL)
_INLINE_CODE_RE = re.compile(r"`[^`\n]+`")
_PARA_RE = re.compile(r"\n{2,}|\n(?=\S)|(?<=\x00)\n")
_HEADING_RE = re.compile(r"^#{1,6}\s")
_PLACEHOLDER = "\x00CODE{}\x00"

# Latin boundary: terminator run + optional closers, then whitespace.
# CJK boundary: full-width terminator run + optional close quotes/brackets,
# no whitespace required (UAX#29 STerm behavior for no-space scripts).
_BOUNDARY_RE = re.compile(
    r"(?P<latin>[.!?…]+[)\]\"'”’»]*)\s+"
    r"|(?P<cjk>[。！？；…‼⁇⁈⁉]+"
    r"[」』）】”’\"']*)"
)
# tokens (possibly dotted, e.g. "e.g") that suppress a Latin '.' break
_ABBREVIATIONS = {
    "mr", "mrs", "ms", "dr", "prof", "st", "fig", "vs", "etc",
    "e.g", "i.e", "al", "jr", "sr", "inc", "ltd", "dept", "approx",
}
# ordinary English words that are abbreviations ONLY before a number
# ("No. 5", "est. 1990") — unconditional guarding would merge every
# sentence ending in "... no." with its successor
_ABBREVIATIONS_BEFORE_DIGIT = {"no", "est"}
_PRE_WORD_RE = re.compile(r"([A-Za-z][A-Za-z.]*)$")

# Thai / Lao / Khmer / Myanmar: scripts with no sentence terminator, where
# the space conventionally delimits sentences/clauses. When a fragment is
# predominantly one of these scripts, whitespace runs become boundaries —
# the spaced-text half of what Intl.Segmenter('und') does
# (src/chunker/sentence-splitter.ts:90). KNOWN DIVERGENCE: unspaced runs
# need ICU dictionary segmentation (PyICU not in container) and stay one
# sentence here; the golden tests pin this behavior.
_SEA_NO_TERM_RE = re.compile(
    "[\\u0e00-\\u0e7f\\u0e80-\\u0eff\\u1000-\\u109f\\u1780-\\u17ff]"
)


def _sea_fraction(s: str) -> float:
    letters = [c for c in s if c.isalpha()]
    if not letters:
        return 0.0
    return sum(1 for c in letters if _SEA_NO_TERM_RE.match(c)) / len(letters)


def _is_abbreviation_break(
    para: str, punct_start: int, punct: str, next_start: int | None = None
) -> bool:
    """True when the '.' at para[punct_start] ends a guarded abbreviation.

    ``next_start`` (index of the text after the boundary's whitespace)
    gates the common-word abbreviations on a following digit."""
    if not punct.startswith("."):
        return False
    m = _PRE_WORD_RE.search(para, 0, punct_start)
    if not m:
        return False
    word = m.group(1).lower()
    if word in _ABBREVIATIONS_BEFORE_DIGIT:
        return (
            next_start is not None
            and next_start < len(para)
            and para[next_start].isdigit()
        )
    return word in _ABBREVIATIONS or (len(m.group(1)) == 1 and m.group(1).isupper())


def _icu_split_paragraph(para: str) -> list[str]:
    """ICU sentence segmentation (root locale == Intl.Segmenter('und')).

    BreakIterator yields each successive boundary offset; segments are
    trimmed and empties dropped, matching the stdlib scanner's contract."""
    bi = _icu.BreakIterator.createSentenceInstance(_icu.Locale.getRoot())
    bi.setText(para)
    out: list[str] = []
    start = 0
    for end in bi:
        sent = para[start:end].strip()
        if sent:
            out.append(sent)
        start = end
    return out


def _split_paragraph(para: str) -> list[str]:
    if _icu is not None:
        return _icu_split_paragraph(para)
    out: list[str] = []
    start = 0
    for m in _BOUNDARY_RE.finditer(para):
        if m.group("latin") is not None:
            seg_end = m.end("latin")
            if _is_abbreviation_break(
                para, m.start("latin"), m.group("latin"), m.end()
            ):
                continue
        else:
            seg_end = m.end("cjk")
        sent = para[start:seg_end].strip()
        if sent:
            out.append(sent)
        start = m.end()
    tail = para[start:].strip()
    if tail:
        out.append(tail)
    # space-delimited segmentation for no-terminator SEA scripts
    final: list[str] = []
    for sent in out:
        if " " in sent and _sea_fraction(sent) >= 0.5:
            final.extend(p for p in sent.split() if p)
        else:
            final.append(sent)
    return final


def split_sentences(text: str) -> list[str]:
    """Split one document into sentences; returns trimmed non-empty strings."""
    if not text:
        return []
    # protect fenced blocks first, then inline code (reference order)
    fences: list[str] = []

    def _stash(m: re.Match) -> str:
        fences.append(m.group(0))
        return _PLACEHOLDER.format(len(fences) - 1)

    protected = _INLINE_CODE_RE.sub(_stash, _FENCE_RE.sub(_stash, text))
    out: list[str] = []
    for para in _PARA_RE.split(protected):
        para = para.strip()
        if not para:
            continue
        if _HEADING_RE.match(para):
            out.append(para)
            continue
        out.extend(_split_paragraph(para))
    # restore code blocks (fenced may nest inline placeholders: two passes)
    restored = []
    for s in out:
        # most sentences carry no placeholder (\x00 marker) — skipping the
        # 2*len(fences) replace scans for them keeps restoration near-free
        # on code-heavy documents
        while "\x00" in s:
            before = s
            for i, code in enumerate(fences):
                s = s.replace(_PLACEHOLDER.format(i), code)
            if s == before:
                break  # stray \x00 not ours; avoid an infinite loop
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
