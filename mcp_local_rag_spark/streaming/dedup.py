"""Streaming near-duplicate detection — the continuous face of the
incremental MinHash pipeline (plans/dedup_index).

A drop-directory watcher signs each arriving micro-batch map-only,
band-joins it against the PERSISTED corpus signature table (the corpus is
never re-shingled — per-batch cost scales with the batch), appends the
candidate pairs to a parquet log, and appends the batch's signatures so
the table stays current. The batch operator and this watcher agree
row-for-row because signatures are deterministic (operators/dedup
constants) — a backfill and the stream produce the same pairs.

Effectively-once: foreachBatch is at-least-once, and BOTH sinks here are
idempotent per batch — the pairs log is partitioned by batch_id and
written with dynamic partition overwrite (a replay rewrites only its own
partition), and the signature append is one deterministically-named file
per batch (plans/dedup_index.append_signature_batch, atomic tmp+rename).
A crash at ANY point therefore makes replay a no-op: even a replay whose
signatures already landed recomputes the identical pair set, because
incremental_candidate_pairs orders ids (id1 < id2), drops self-pairs,
and dedups — the batch band-joining its own persisted copy adds no rows.
The marker file (_mark_batch_applied) survives only as a cheap
skip-fast-path for fully-applied batches.

Scale posture: one micro-batch holds <= max_files_per_trigger documents;
the band join's corpus side is an equi-join on (band, band_key) against
the signature table — at 100 TB that table is one narrow row per
document, bucketed like the chunks table, and the join shuffles only the
matching band keys, never corpus text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .watch import _batch_already_applied, _mark_batch_applied, _uri_to_path


def stream_dedup(
    spark: SparkSession,
    watch_dir: str,
    sig_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    *,
    pattern: str = "*.{md,txt}",
    max_files_per_trigger: int = 100,
    available_now: bool = False,
):
    """Watch a directory; emit (id1, id2, batch_id) near-dup candidate
    pairs for every arriving document against everything seen so far.

    Document identity is the file path (the same key the chunks table
    uses). The first batch against a missing signature table bootstraps
    it (dedup within the batch only — plans/dedup_index.incremental_dedup
    handles the empty-corpus case), so the watcher can be started on an
    empty corpus directory.
    """
    from ..plans.dedup_index import append_signature_batch, incremental_dedup

    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(watch_dir)
        .select(
            _uri_to_path(F.input_file_name()).alias("doc_id"),
            F.col("value").alias("text"),
        )
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty() or _batch_already_applied(checkpoint_dir, batch_id):
            return
        # both sinks are idempotent per batch (module docstring), so the
        # order of the two writes no longer carries a crash contract. If
        # the batch's own signature file already landed (crash after the
        # sig write), the corpus side includes the batch — the recomputed
        # pair set is still identical because incremental_candidate_pairs
        # drops self-pairs and dedups.
        pairs = incremental_dedup(
            spark, sig_path, batch, id_col="doc_id", text_col="text", append=False
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_path)
        )
        # signatures are deterministic (operators/dedup constants), so
        # re-signing the micro-batch writes exactly the rows
        # incremental_dedup computed internally — as one atomic
        # batch-named file a replay overwrites byte-for-byte
        append_signature_batch(
            batch, sig_path, batch_id=batch_id, id_col="doc_id", text_col="text"
        )
        spark.catalog.refreshByPath(sig_path)
        _mark_batch_applied(checkpoint_dir, batch_id)

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
