"""Streaming CDC apply — the continuous face of plans/merge.

A parquet drop-directory stream of CDC batches (upserts + tombstones)
feeds each micro-batch through ``merge_into``, so the snapshot table is
always the exact merged state of everything that has arrived, with the
full warehouse surface live underneath the stream: time travel across
micro-batches, the change feed between any two of them, downstream
views riding plans/changefeed.

Exactly-once follows the same protocol as streaming/ivm: foreachBatch
is at-least-once, so every merge carries ``batch_key=f"stream-{id}"``
and plans/merge records the key inside the SAME atomic manifest commit
that makes the merge visible — a replayed batch short-circuits on the
recorded key (bounded retention: merge._APPLIED_KEEP recent keys, wide
enough for any checkpoint-tail replay).

Scale posture: per-trigger cost is the micro-batch's touched buckets —
read, full-outer join, rewrite — never the absorbed table
(WAREHOUSE_SCALE_r10.json pins the flat per-batch exponent). The
delete flag rides the stream as an ordinary boolean column, the
Debezium/CDC tombstone shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.merge import merge_into


def stream_merge(
    spark: SparkSession,
    watch_dir: str,
    table_path: str,
    checkpoint_dir: str,
    schema,
    *,
    delete_col: str | None = None,
    prepare=None,
    order_col: str | None = None,
    sync_indexes: list[str] | None = None,
    max_files_per_trigger: int = 100,
    available_now: bool = False,
):
    """Maintain the snapshot table at ``table_path`` (created beforehand
    with create_merge_table) from CDC parquet files arriving in
    ``watch_dir``. ``prepare`` (optional, deterministic — it re-runs on
    replay) maps each raw micro-batch to the table's schema plus the
    delete flag.

    ``order_col``: a CDC stream routinely carries SEVERAL changes for
    one key in one micro-batch; merge_into requires unique source keys.
    Naming the stream's ordering column (LSN, ts, offset) collapses each
    key to its latest change before the merge — per-key last-write-wins,
    the Debezium snapshot-read semantics. The column is dropped before
    merging unless it is part of the table schema."""
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(watch_dir)
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        src = prepare(batch) if prepare is not None else batch
        if order_col is not None:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            from ..plans.merge import read_manifest, read_snapshot

            key = read_manifest(table_path)["key"]
            w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
            src = (
                src.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            # schema probe reads footers only — no job
            if order_col not in read_snapshot(spark, table_path).columns:
                src = src.drop(order_col)
        merge_into(
            spark, table_path, src,
            delete_col=delete_col,
            batch_key=f"stream-{batch_id}",
        )
        # secondary indexes ride the change feed AFTER the merge commits;
        # each sync is itself exactly-once (the view's cdf cursor lives
        # in its own manifest), so a crash between merge and sync just
        # leaves the index one sync behind — the next batch catches it up
        for idx in sync_indexes or ():
            from ..plans.secondary import sync_secondary_index

            sync_secondary_index(spark, idx)

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
