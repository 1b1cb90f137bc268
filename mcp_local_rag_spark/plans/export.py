"""Training-shard export — the pipeline's LAST MILE: take the curated
corpus (post dedup/decontaminate/quality, i.e. the keep-set of
corpus_curation_pipeline) and materialize trainer-consumable shards.

Two shapes:

  * ``export_jsonl_shards`` — line-JSON shards (what most data loaders
    stream), one directory per (lang) shard key, files size-bounded via
    ``maxRecordsPerFile``. JSONL because the consumer is a sequential
    reader, not an analytical engine.
  * ``export_packed_parquet`` — the sequence-packed form: documents
    carry their (shard_key, bin) assignment from the same running-budget
    rule ``documents_pack_bins`` verifies, written bucketed by bin so a
    trainer's sampler reads one bin = one context-budget group per file.

Scale posture: assignment is a per-shard-key window (partitioned, never
a global sort); the write is ONE job with the same one-file-per-bucket
discipline as plans/ingest.write_chunks; nothing collects to the
driver. Determinism: shard and bin assignment are pure functions of
(shard key, doc order), so re-running the export reproduces the same
shards byte-for-byte (modulo parquet metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

DEFAULT_BIN_BUDGET = 8192  # chars per packed context bin (pack_bins rule)


def assign_pack_bins(
    docs: DataFrame,
    *,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    length_col: str = "n_chars",
    budget: int = DEFAULT_BIN_BUDGET,
) -> DataFrame:
    """The streaming-packing assignment (bin = start offset // budget),
    per shard key — the SAME rule the oracle-paired documents_pack_bins
    aggregates, exposed row-level for the export sinks."""
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.withColumn(
        "bin",
        (
            (F.sum(length_col).over(w) - F.col(length_col)) / F.lit(budget)
        ).cast("long"),
    )


def export_jsonl_shards(
    docs: DataFrame,
    path: str,
    *,
    shard_col: str = "lang",
    max_records_per_file: int = 10_000,
) -> None:
    """Write line-JSON shards partitioned by ``shard_col``; each file
    holds at most ``max_records_per_file`` records. One Spark job; the
    repartition clusters each shard into one task so a shard's files are
    written contiguously (the writer splits them by the record cap)."""
    (
        docs.repartition(F.col(shard_col))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(shard_col)
        .json(path)
    )


def export_packed_parquet(
    docs: DataFrame,
    path: str,
    *,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    length_col: str = "n_chars",
    budget: int = DEFAULT_BIN_BUDGET,
) -> None:
    """Sequence-packed parquet: rows carry (shard, bin) from
    ``assign_pack_bins`` and land partitioned by shard with one
    bin-sorted file per shard, so a sampler's read of a context-budget
    group is one contiguous row-group range."""
    packed = assign_pack_bins(
        docs,
        shard_col=shard_col,
        order_col=order_col,
        length_col=length_col,
        budget=budget,
    )
    (
        packed.repartition(F.col(shard_col))
        .sortWithinPartitions(shard_col, "bin", order_col)
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .parquet(path)
    )
