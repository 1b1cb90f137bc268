"""Persisted MinHash signature table — the dedup twin of the FTS postings
index (plans/fts): computed once when a corpus is ingested, appended per
arriving batch, and diffed incrementally so deduplication cost scales
with the batch, not the corpus.

Layout: one row per document, (id, sig0..sig{n-1}), plain parquet.
Signatures are deterministic (operators/dedup constants), so an
incremental run against the stored table returns exactly the pairs a
full recompute would — pinned by tests/test_dedup.py. At 100 TB the
table would be bucketed by id hash like the chunks table so the
band-key build co-partitions with other per-doc artifacts; the row
volume (one narrow row per doc) makes even the plain layout cheap
relative to the corpus it indexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import (
    incremental_candidate_pairs,
    minhash_signatures_docs,
)


def _has_data(path: str) -> bool:
    """Whether the signature table holds any parquet data files (same
    posture as plans/fts.index_has_data: no Spark call, and real read
    errors are never mapped to 'empty')."""
    import glob
    import os

    return bool(glob.glob(os.path.join(path, "*.parquet")))


def write_signatures(
    docs: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Shingle + sign ``docs`` and persist the signature table."""
    sigs = minhash_signatures_docs(docs, id_col=id_col, text_col=text_col)
    sigs.write.mode(mode).parquet(path)


def read_signatures(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def append_signature_batch(
    docs: DataFrame,
    path: str,
    *,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """IDEMPOTENT per-batch signature append for at-least-once streaming
    sinks: the batch's signatures land as ONE deterministically-named
    parquet file (``batch-<id>``) via an atomic tmp+rename, so a replayed
    micro-batch overwrites identical bytes instead of appending duplicate
    rows — replay is a no-op, whatever the crash point.

    Driver-side write is bounded by construction: a micro-batch holds at
    most ``maxFilesPerTrigger`` documents and each contributes one narrow
    signature row, so the Arrow collect is a few KB regardless of corpus
    size. The tmp name is dot-prefixed so Spark's file listing never sees
    a half-written footer.
    """
    import os

    import pyarrow.parquet as pq

    sigs = minhash_signatures_docs(docs, id_col=id_col, text_col=text_col)
    table = sigs.toArrow()
    os.makedirs(path, exist_ok=True)
    final = os.path.join(path, f"batch-{batch_id}.snappy.parquet")
    tmp = os.path.join(path, f".batch-{batch_id}.tmp")
    pq.write_table(table, tmp, compression="snappy")
    os.replace(tmp, final)


def incremental_dedup(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    append: bool = True,
) -> DataFrame:
    """Candidate pairs of ``new_docs`` against the stored corpus (plus
    new-vs-new), then — by default — append the batch's signatures so the
    table stays current. The corpus is never re-shingled; the batch signs
    map-only and band-joins the stored bands (operators/dedup.
    incremental_candidate_pairs). Returns (id1, id2), materialized before
    the append so the result is stable against the table mutation.
    """
    new_sigs = minhash_signatures_docs(
        new_docs, id_col=id_col, text_col=text_col
    ).persist()
    new_sigs.count()
    if _has_data(path):
        corpus_sigs = read_signatures(spark, path)
    else:
        # bootstrap: a first batch against a missing/empty table dedups
        # only within itself (empty corpus side) and then seeds the table
        # — the streaming watcher needs no separate first-run code path
        corpus_sigs = spark.createDataFrame([], new_sigs.schema)
    # localCheckpoint (eager) rather than persist: the result must be
    # materialized before the append mutates the table it was derived
    # from, but a persist would stay pinned in executor storage for every
    # maintenance-loop iteration until driver GC — checkpoint blocks are
    # released as soon as the returned frame goes out of scope
    pairs = incremental_candidate_pairs(
        new_sigs, corpus_sigs, id_col=id_col
    ).localCheckpoint()
    if append:
        new_sigs.write.mode("append").parquet(path)
        spark.catalog.refreshByPath(path)
    new_sigs.unpersist()
    return pairs
