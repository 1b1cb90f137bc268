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
from pyspark.sql.types import ArrayType, StringType

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
