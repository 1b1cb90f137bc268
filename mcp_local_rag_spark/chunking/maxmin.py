"""Max-Min semantic chunking (reference T4,
src/chunker/semantic-chunker.ts:100-327; algorithm from the Max-Min semantic
chunking paper, Springer 2025).

Semantics reproduced exactly:
  * first sentence always opens a chunk;
  * 2nd sentence joins iff initConst * cos(s0, s1) > hardThreshold;
  * later sentences join iff maxSim(new, chunk) >
      max(c * minSim(chunk) * sigmoid(|chunk|), hardThreshold),
    where minSim is the min pairwise cosine over the LAST window(=5)
    sentences (O(1) approximation) and |chunk| counts sentences;
  * force split at max_sentences(=15);
  * chunk text = sentences joined with ' ';
  * chunks shorter than min_chunk_length(=50) are dropped unless they
    contain an atomic unit; garbage chunks (empty / decoration / >80%
    one-char) are dropped.

Execution model: the grouping is inherently sequential per document, so it
runs in Python over doc-sorted Arrow batches (``mapInPandas``, many
documents per batch — see ``maxmin_chunk``) — parallel across documents
(the 100 TB axis), sequential within one. Vector math is numpy over an
Arrow batch; no per-row Python round trips, no per-document Python
invocations.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

HARD_THRESHOLD = 0.6
INIT_CONST = 1.5
C = 0.9
WINDOW_SIZE = 5
MAX_SENTENCES = 15
MIN_CHUNK_LENGTH = 50

_ALNUM_RE = re.compile(r"[a-zA-Z0-9]")
_DECOR_RE = re.compile(r"^[-=_.*#|~`@!%^&*()\[\]{}\\/<>:+\s]+$")


def _is_garbage(text: str) -> bool:
    """reference isGarbageChunk (semantic-chunker.ts:65-84): empty -> garbage;
    any ASCII alphanumeric -> keep; decoration-only -> garbage; >80% one
    character -> garbage."""
    t = text.strip()
    if not t:
        return True
    if _ALNUM_RE.search(t):
        return False
    if _DECOR_RE.match(t):
        return True
    counts: dict[str, int] = {}
    for ch in t:
        counts[ch] = counts.get(ch, 0) + 1
    return max(counts.values()) / len(t) > 0.8


def _cos(a: np.ndarray, b: np.ndarray) -> float:
    na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
    if na == 0.0 or nb == 0.0:
        return 0.0
    return float(np.dot(a, b)) / (na * nb)


def group_sentences(vectors: np.ndarray) -> list[list[int]]:
    """Return sentence-index groups for one document (pure, testable)."""
    n = len(vectors)
    if n == 0:
        return []
    # norms are fixed per sentence but each one was being recomputed for
    # every pairwise comparison (up to ~25 cosines per joined sentence);
    # caching them keeps the ARITHMETIC identical (same dot, same norms,
    # same division order) so chunk-boundary goldens are unaffected
    norms = [float(np.linalg.norm(v)) for v in vectors]

    def cos(a: int, b: int) -> float:
        if norms[a] == 0.0 or norms[b] == 0.0:
            return 0.0
        return float(np.dot(vectors[a], vectors[b])) / (norms[a] * norms[b])

    groups: list[list[int]] = []
    cur: list[int] = [0]
    for i in range(1, n):
        if len(cur) == 1:
            join = INIT_CONST * cos(cur[0], i) > HARD_THRESHOLD
        elif len(cur) >= MAX_SENTENCES:
            join = False
        else:
            # len(cur) is in [2, MAX_SENTENCES) here, so the window always
            # holds >= 2 members — no single-member special case exists
            window = cur[-WINDOW_SIZE:]
            min_sim = min(
                cos(window[a], window[b])
                for a in range(len(window))
                for b in range(a + 1, len(window))
            )
            max_sim = max(cos(j, i) for j in cur)
            sigmoid = 1.0 / (1.0 + math.exp(-len(cur)))
            threshold = max(C * min_sim * sigmoid, HARD_THRESHOLD)
            join = max_sim > threshold
        if join:
            cur.append(i)
        else:
            groups.append(cur)
            cur = [i]
    groups.append(cur)
    return groups


CHUNK_SCHEMA = StructType(
    [
        StructField("doc_key", StringType()),
        StructField("chunk_index", IntegerType()),
        StructField("text", StringType()),
        StructField("n_sentences", IntegerType()),
    ]
)


def maxmin_chunk(
    sentences: DataFrame,
    *,
    key_col: str = "doc_key",
    seq_col: str = "seq",
    text_col: str = "text",
    vec_col: str = "vector",
    atomic_col: str | None = None,
    min_chunk_length: int = MIN_CHUNK_LENGTH,
) -> DataFrame:
    """Group (doc_key, seq, text, vector[, atomic]) sentence rows into chunks.

    One shuffle keyed by document; documents are processed MANY per Arrow
    batch. Output: (doc_key, chunk_index, text, n_sentences).

    Execution: ``repartition(doc) + sortWithinPartitions(doc, seq) +
    mapInPandas`` rather than ``groupBy(doc).applyInPandas``. Same single
    exchange, but applyInPandas invokes Python once per GROUP — and the
    corpus grain is thousands of small documents (~7 sentences each), so
    per-group serialization/invocation overhead (~1.5 ms) dwarfed the
    recurrence itself: the operator ran 8.8 s over sf0.1 where the
    per-doc math is milliseconds (guide §4: keep batches large).
    mapInPandas sees whole 10k-row batches (~1.3k documents) per Python
    call and splits documents by contiguous key runs in numpy; a
    document straddling two batches is carried over (batches arrive in
    partition row order, so runs stay contiguous). Measured: 8.8 s ->
    2.6 s at sf0.1 (min-of-3, the after under worse ambient), identical
    rows.
    """
    cols = [key_col, seq_col, text_col, vec_col]
    has_atomic = atomic_col is not None
    if has_atomic:
        cols.append(atomic_col)
    out_cols = ["doc_key", "chunk_index", "text", "n_sentences"]

    def _chunk_iter(batches):
        def emit(pdf: pd.DataFrame, rows: list) -> None:
            # one document's rows, already seq-sorted by the partition sort
            vectors = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            texts = pdf[text_col].tolist()
            atomics = (
                pdf[atomic_col].tolist() if has_atomic else [False] * len(texts)
            )
            key = pdf[key_col].iloc[0]
            idx = 0
            for group in group_sentences(vectors):
                chunk_text = " ".join(texts[i] for i in group)
                has_atomic_unit = any(atomics[i] for i in group)
                if (
                    has_atomic_unit or len(chunk_text) >= min_chunk_length
                ) and not _is_garbage(chunk_text):
                    rows.append((key, idx, chunk_text, len(group)))
                    idx += 1

        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy()
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pdf)]))
            rows: list = []
            # last run may continue in the next batch — hold it back
            for s, e in zip(starts[:-1], ends[:-1]):
                emit(pdf.iloc[s:e], rows)
            carry = pdf.iloc[starts[-1] :].copy()
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)
        if carry is not None and len(carry):
            rows = []
            emit(carry, rows)
            if rows:
                yield pd.DataFrame(rows, columns=out_cols)

    part = (
        sentences.select(*cols)
        .repartition(key_col)
        .sortWithinPartitions(key_col, seq_col)
    )
    return part.mapInPandas(_chunk_iter, CHUNK_SCHEMA)
