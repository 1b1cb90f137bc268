"""Streaming near-duplicate detection — the continuous face of the
incremental MinHash pipeline (plans/dedup_index).

A drop-directory watcher signs each arriving micro-batch map-only,
band-joins it against the PERSISTED corpus signature table (the corpus is
never re-shingled — per-batch cost scales with the batch), appends the
candidate pairs to a parquet log, and appends the batch's signatures so
the table stays current. The batch operator and this watcher agree
row-for-row because signatures are deterministic (operators/dedup
constants) — a backfill and the stream produce the same pairs.

Effectively-once: foreachBatch is at-least-once, and both sinks here
(pairs log + signature table) are non-idempotent appends, so the watcher
reuses the marker-file discipline of streaming/watch (_mark_batch_applied
written after both appends; a re-delivered fully-applied batch is
skipped). A crash strictly between the two appends can leave a batch's
pairs logged without its signatures — the next full rebuild
(write_signatures overwrite) is the documented repair, same posture as
postings compaction.

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
    from ..plans.dedup_index import incremental_dedup, write_signatures

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
        # persistence order matches the documented crash contract: pairs
        # log FIRST, signatures second. A crash between the two appends
        # leaves "pairs logged without signatures" (the documented
        # repair: full write_signatures rebuild) — never the reverse,
        # where a replayed batch would band-join against its own
        # already-appended signatures and duplicate signature rows.
        pairs = incremental_dedup(
            spark, sig_path, batch, id_col="doc_id", text_col="text", append=False
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(pairs_path)
        )
        # signatures are deterministic (operators/dedup constants), so
        # re-signing the micro-batch here appends exactly the rows
        # incremental_dedup computed internally
        write_signatures(
            batch, sig_path, id_col="doc_id", text_col="text", mode="append"
        )
        spark.catalog.refreshByPath(sig_path)
        _mark_batch_applied(checkpoint_dir, batch_id)

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
