"""Shared helpers for the paired Spark/DuckDB query registry.

Determinism rules (both engines):
  * every float output is round(x, 6);
  * every LIMIT ranks on (rounded score, unique id) — a total order;
  * sums that DuckDB would widen to HUGEINT are cast to BIGINT/DOUBLE.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load

REGISTRY: dict[str, dict] = {}


def register(name: str, sql: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = {"spark": fn, "sql": sql}
        return fn

    return deco


# ---------------------------------------------------------------------------
# The "chunks" view — the reference's single core table (SURVEY §1.1) mapped
# onto the driver's synthetic corpus: one document == one chunk,
# filePath = /corpus/<source>/doc<doc_id>.md, vector = its embedding.

def chunks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread: interleaved A/B (AB_DRIFT: ec148ae vs spread-everywhere
    # HEAD, 5 swapped passes) showed every chunks-rooted headline lane
    # pays MORE for the round-robin exchange of the full text+vector rows
    # than the widened map side saves (hybrid_search +49%, bm25_unigram
    # +33%, vector_topk +24% raw). The heavy dedup/BPE lanes that do win
    # spread have their own roots (_dedup_corpus, _deep_encode_df).
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            F.concat_ws(
                "", F.lit("/corpus/"), docs.source, F.lit("/doc"),
                docs.doc_id.cast("string"), F.lit(".md"),
            ).alias("filePath"),
            docs.doc_id.alias("chunkIndex"),
            docs.text,
            docs.lang,
            docs.n_chars,
            emb.embedding.alias("vector"),
            emb.label,
        )
    )


CHUNKS_CTE = """
chunks AS (
  SELECT '/corpus/' || d.source || '/doc' || d.doc_id || '.md' AS filePath,
         d.doc_id AS chunkIndex, d.text, d.lang, d.n_chars,
         e.embedding AS vector, e.label
  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
)
"""


def query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    """The fixed query vector: embedding of a given vec_id (a query
    parameter, not data-plane). Read via pyarrow directly — a one-row
    point lookup does not need a Spark job (same stance as the
    NeighborServer serving path)."""
    import os

    import pyarrow.dataset as ds

    dataset = ds.dataset(os.path.join(sf_dir, "embeddings.parquet"))
    tbl = dataset.to_table(
        columns=["embedding"], filter=ds.field("vec_id") == vec_id
    )
    return [float(x) for x in tbl["embedding"][0].as_py()]


# SQL fragment for the same query vector, usable as a scalar list subquery.
def qvec_sql(vec_id: int = 0) -> str:
    return f"(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = {vec_id})"
