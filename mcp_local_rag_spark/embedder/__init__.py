"""Pluggable text embedding (reference T3, src/embedder/index.ts).

The reference runs Xenova/all-MiniLM-L6-v2 (384-d) through ONNX with batch
16, mean pooling + L2 normalization, deferring padding-outlier texts to
singleton batches. On Spark the same stage is an Arrow-batched pandas UDF;
batching/padding concerns become "sort by length inside the batch" and the
Arrow batch size config.

No model runtime ships in this container, so the default implementation is
a DETERMINISTIC pseudo-embedder (sha256-seeded unit vectors) — the same
strategy the reference's own perf test uses (constant vectors,
src/server/__tests__/rag-server.read-neighbors.perf.test.ts:43). A real
sentence-transformers encoder drops into ``embed_text_column`` behind the
same signature (gated behind an import-try).
"""

from __future__ import annotations

import functools as _functools
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

DEFAULT_DIM = 64


def pseudo_embed(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Deterministic unit vector from the text's sha256 (locality-free —
    a hashing stand-in, not a semantic model)."""
    out = np.empty(dim, dtype=np.float64)
    i = 0
    counter = 0
    while i < dim:
        h = hashlib.sha256(f"{counter}|{text}".encode()).digest()
        block = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
        take = min(dim - i, len(block))
        out[i : i + take] = block[:take] / 255.0 - 0.5
        i += take
        counter += 1
    norm = np.linalg.norm(out)
    if norm > 0:
        out /= norm
    return [float(x) for x in out]


def _pseudo_udf(dim: int):
    @F.pandas_udf(ArrayType(FloatType()))
    def udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: pseudo_embed(t or "", dim))

    return udf


def hashing_embed(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Feature-hashing bag-of-tokens embedding (the HashingVectorizer
    construction): each token hashes to a bucket with a ±1 sign, counts
    L2-normalized. Unlike ``pseudo_embed`` (locality-free), this is a REAL
    lexical-similarity embedding — token overlap produces high cosine — so
    ranking-quality assertions ("the chunk about X ranks first") are
    testable without a model runtime. A trained encoder still adds what
    hashing cannot: synonymy and word order."""
    import re as _re

    vec = np.zeros(dim, dtype=np.float64)
    for tok in _re.findall(r"[a-z0-9]+", (text or "").lower()):
        h = hashlib.md5(tok.encode()).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        vec[idx] += 1.0 if h[4] & 1 else -1.0
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec /= norm
    return [float(x) for x in vec]


def _hashing_udf(dim: int):
    @F.pandas_udf(ArrayType(FloatType()))
    def udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hashing_embed(t or "", dim))

    return udf


DEFAULT_MODEL = "sentence-transformers/all-MiniLM-L6-v2"


@_functools.lru_cache(maxsize=4)
def _cached_model(model_name: str):
    """Driver-side SentenceTransformer cache — loading the model is seconds
    of work; re-instantiating per query would dominate every search."""
    from sentence_transformers import SentenceTransformer

    return SentenceTransformer(model_name)


def embed_query(
    text: str,
    dim: int = DEFAULT_DIM,
    backend: str = "pseudo",
    *,
    model_name: str = DEFAULT_MODEL,
) -> list[float]:
    """Driver-side query-vector twin of ``embed_text_column`` — the query
    MUST embed under the same backend (and, for 'model', the same
    ``model_name``) as the corpus or distances are meaningless."""
    if backend == "hashing":
        return hashing_embed(text, dim)
    if backend == "model":
        if _try_sentence_transformers(model_name) is None:
            raise ImportError("sentence-transformers not available")
        model = _cached_model(model_name)
        return [float(x) for x in model.encode([text], normalize_embeddings=True)[0]]
    if backend != "pseudo":
        raise ValueError(
            f"unknown embedding backend {backend!r} (pseudo|hashing|model) — "
            "silently falling back would embed in a locality-free space and "
            "make every similarity score garbage with no error anywhere"
        )
    return pseudo_embed(text, dim)


def _try_sentence_transformers(model_name: str):
    try:
        from sentence_transformers import SentenceTransformer  # noqa: F401
    except ImportError:
        return None

    def factory(dim: int):
        @F.pandas_udf(ArrayType(FloatType()))
        def udf(texts: pd.Series) -> pd.Series:
            # per-PROCESS model init via the lru_cache — constructing the
            # model inline would reload it for every Arrow batch, paying
            # the multi-second load hundreds of times per executor.
            # Length-sorted batching replaces the reference's padding-
            # outlier deferral (same goal: bound padding amplification,
            # src/embedder/index.ts:56-93)
            model = _cached_model(model_name)
            order = texts.str.len().sort_values().index
            vecs = model.encode(
                texts.loc[order].fillna("").tolist(), normalize_embeddings=True
            )
            restored = pd.Series(list(vecs), index=order).sort_index()
            return restored.map(list)

        return udf

    return factory


def embed_text_column(
    df: DataFrame,
    text_col: str | Column = "text",
    out_col: str = "vector",
    *,
    dim: int = DEFAULT_DIM,
    backend: str = "pseudo",
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
) -> DataFrame:
    """Append an embedding column. backend: 'pseudo' (deterministic, always
    available), 'hashing' (feature-hashing bag of tokens — real lexical
    similarity, no model runtime), or 'model' (sentence-transformers, if
    installed)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    if backend == "model":
        factory = _try_sentence_transformers(model_name)
        if factory is not None:
            return df.withColumn(out_col, factory(dim)(col))
        raise ImportError(
            "sentence-transformers not available; use backend='pseudo'"
        )
    if backend == "hashing":
        return df.withColumn(out_col, _hashing_udf(dim)(col))
    if backend != "pseudo":
        raise ValueError(
            f"unknown embedding backend {backend!r} (pseudo|hashing|model)"
        )
    return df.withColumn(out_col, _pseudo_udf(dim)(col))
