"""Streaming rollup maintenance — the continuous face of plans/ivm.

A parquet drop-directory stream feeds each micro-batch through
``ivm_apply``, so the maintained view is always the exact grouped
aggregate of everything that has arrived — no recompute, no approximate
"update mode" sink. The batch operator and this watcher agree
row-for-row because the fold is the same code path.

Exactly-once without a transactional sink: foreachBatch is
at-least-once, so every fold carries ``batch_key=f"stream-{batch_id}"``
— plans/ivm records the key inside the SAME atomic manifest commit that
makes the fold visible. A replayed batch (crash after commit, before
checkpoint advance) short-circuits on the recorded key; there is no
partial window because manifest flips are tmp+rename. The guarantee
rides Structured Streaming's contract that a batch_id replayed FROM THE
CHECKPOINT carries identical contents; after total checkpoint loss,
re-planned ids only coincide when the source re-batches identically
(availableNow over an unchanged directory — the tested recovery), so
treat the checkpoint as the unit of loss, not individual offsets.

Scale posture: per-trigger cost is one delta-sized partial aggregate
plus a join against only the state buckets the delta's keys hash into
(manifest-pruned). State size rides key cardinality, not stream length —
this is the Structured Streaming aggregation most pipelines actually
want once state outgrows the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.ivm import ivm_apply


def stream_ivm(
    spark: SparkSession,
    watch_dir: str,
    state_path: str,
    checkpoint_dir: str,
    keys: list[str],
    measures: list[tuple],
    schema,
    *,
    prepare=None,
    max_files_per_trigger: int = 100,
    available_now: bool = False,
):
    """Maintain the IVM state table at ``state_path`` from parquet files
    arriving in ``watch_dir``. ``prepare`` (optional) maps each raw
    micro-batch DataFrame to the delta shape the view aggregates
    (derive group keys, cast measure inputs); it must be deterministic —
    it re-runs on replay."""
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(watch_dir)
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        delta = prepare(batch) if prepare is not None else batch
        ivm_apply(
            spark, state_path, delta, keys, measures,
            batch_key=f"stream-{batch_id}",
        )

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
