"""Structured Streaming ingest — the file-watcher extension.

The reference is batch-only (SURVEY §2.10: sync_start is an async batch job
with polling); this module is the Spark-native continuous counterpart: a
file-source stream over a drop directory, the SAME batch ingest pipeline
applied per micro-batch via foreachBatch, appending to the chunks table.

Design points for scale:
  * file source tracks processed files in the checkpoint — exactly-once per
    file, restart-safe (replaces the reference's in-memory job record);
  * foreachBatch reuses plans/ingest.build_chunks unchanged — one code path
    for batch and streaming (the Dataflow/kappa stance);
  * maxFilesPerTrigger bounds micro-batch size so embed/chunk stages see
    steady Arrow batch shapes;
  * Trigger.AvailableNow drains the backlog then stops — used in tests and
    for catch-up runs.

Also here: watermarked sliding-window aggregation over an event stream —
the standard late-data pattern (not in the reference; part of the
training-pipeline extension surface).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_parquet


def _uri_to_path_py(uri: str) -> str:
    from urllib.parse import unquote, urlparse

    parsed = urlparse(uri)
    return unquote(parsed.path) if parsed.scheme else unquote(uri)


def _make_uri_to_path():
    """File-source paths arrive as percent-encoded file URIs
    (``file:///a/my%20doc.txt``); stored filePaths are PLAIN local paths
    (what batch ``read_files`` records). Normalizing here keeps the two
    ingest paths key-compatible — a mangled spelling would make sync
    classify every streamed row as prune, bucket it differently, and
    orphan it from per-file delete/upsert/FTS refresh forever.
    urllib.unquote (not a www-form decoder) so a literal '+' survives.
    Arrow-batched (pandas_udf) like every other Python hook in the
    package — one Series op per micro-batch, not a per-row round trip."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _convert(uris):
        return pd.Series([_uri_to_path_py(u or "") for u in uris])

    _convert.__annotations__ = {"uris": pd.Series, "return": pd.Series}
    return pandas_udf(_convert, "string")


def _uri_to_path(col):
    """Column wrapper: the pandas_udf is built lazily (first use inside an
    active session) — eager construction at import time fails before any
    SparkSession exists."""
    return _make_uri_to_path()(col)


def _batch_already_applied(checkpoint_dir: str, batch_id: int) -> bool:
    """foreachBatch is at-least-once: after a crash between the sink append
    and the checkpoint commit, the NEXT run re-delivers the same batch_id.
    Both sinks here (chunks parquet + postings) are non-idempotent appends,
    so re-applying a fully-applied batch would duplicate rows. A marker
    file written AFTER both appends turns the pair effectively-once: a
    re-delivered batch whose marker exists is skipped. (A crash strictly
    between the two appends still leaves a partial batch — compaction-level
    dedup is the remaining cover; the marker closes the common full-replay
    case.)"""
    return os.path.exists(
        os.path.join(checkpoint_dir, "applied_batches", str(batch_id))
    )


def _mark_batch_applied(checkpoint_dir: str, batch_id: int) -> None:
    d = os.path.join(checkpoint_dir, "applied_batches")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, str(batch_id)), "w") as f:
        f.write("1")


def _register_shard_containers(table_path: str, hashes: dict[str, str]) -> None:
    """Merge streamed shard paths -> content sha256 into the table's
    persisted ``shard_containers`` property — the SAME membership record
    batch ``ingest_shards`` writes (engine._set_shard_containers), and the
    record the engine's directory sync() prune shield and sync_shards'
    change detection key off. Without it every streamed shard row would
    classify as prune on the next routine directory sync."""
    if not hashes:
        return
    from ..plans.ingest import read_table_meta, table_n_buckets, write_table_meta

    known = read_table_meta(table_path).get("shard_containers")
    merged = (
        {str(k): str(v) for k, v in known.items()} if isinstance(known, dict) else {}
    )
    merged.update(hashes)
    write_table_meta(
        table_path,
        table_n_buckets(table_path),
        extra={"shard_containers": dict(sorted(merged.items()))},
    )


def _append_chunk_batch(
    chunks: DataFrame,
    table_path: str,
    postings_path: str | None,
    tokenizer: str,
) -> None:
    """Append one micro-batch of chunk rows to the bucketed chunks table
    and, when an FTS index rides along, append the batch's postings to it.

    Postings maintenance is APPEND-only here: streaming file sources see
    each file exactly once (files are immutable to the source), so there
    are never stale postings to replace — the bucket-local rewrite path
    (plans/fts.refresh_postings) is for batch upsert/delete. A first batch
    against a missing index bootstraps it bucket-aligned with the chunks
    table so later batch refreshes stay document-aligned.

    PARTIAL-REPLAY CLEANSE (round 15): foreachBatch is at-least-once and
    the applied-batch marker only closes the FULL-replay case. A crash
    between the chunks append and the marker leaves this batch's rows in
    the table, and the replayed batch would duplicate them. Because the
    file source sees each immutable path exactly once, this batch's
    paths can pre-exist only as such remnants (or as rows a prior BATCH
    ingest wrote for the same path — where replace-then-append is upsert,
    the right call), so one bucket-pruned existence probe decides: on a
    hit, the remnant rows and their postings are removed BEFORE the
    re-append. Every crash window is therefore duplicate-free, not just
    the common full-replay one (pinned by the streaming lifecycle fuzz in
    tests/test_streaming.py)."""
    from contextlib import nullcontext

    from ..plans.fts import write_postings
    from ..plans.ingest import attribute_mutations, table_n_buckets, write_chunks

    nb = table_n_buckets(table_path)
    attributed = postings_path is not None
    # the batch is read several times (remnant probe + intent paths +
    # chunks append + postings build); without a persist the WHOLE
    # upstream pipeline — parse, chunk, and the embedding passes, the
    # dominant cost — would re-execute for each
    chunks = chunks.persist()
    batch_paths = {
        r["filePath"] for r in chunks.select("filePath").distinct().collect()
    }
    spark = chunks.sparkSession
    if attributed:
        # cooperating-writer protocol (plans/engine_txn, round 13): the
        # watcher records the batch's paths BEFORE mutating — including
        # before the remnant cleanse below, whose delete is a table
        # mutation like any other — and runs its bumps attributed, so a
        # crash anywhere between the first mutation and the covers stamp
        # leaves a PROVEN intent — a restarted engine on this table
        # recovers with a bounded refresh of these paths instead of the
        # full O(corpus) rebuild an unattributed covers-mismatch forces
        from ..plans.engine_txn import publish_intent, retire_fts_paths

        publish_intent(table_path, paths=batch_paths)
    if batch_paths and glob.glob(os.path.join(table_path, "bucket=*")):
        from ..functions.spark_hash import bucket_of
        from ..plans.ingest import delete_documents

        paths = sorted(batch_paths)
        bks = sorted({bucket_of(p, nb) for p in paths})
        remnant = (
            read_parquet(spark, table_path)
            .filter(F.col("bucket").isin(bks) & F.col("filePath").isin(paths))
            .limit(1)
            .count()
        )
        if remnant:
            # attributed like every other mutation: the cleanse's bump
            # must extend the intent's version chain, or a crash between
            # here and the final covers stamp degrades a restarted
            # engine's bounded recovery to the full rebuild
            with attribute_mutations(table_path) if attributed else nullcontext():
                delete_documents(spark, table_path, paths)
            if postings_path is not None and os.path.isdir(postings_path):
                from ..plans.fts import refresh_postings

                refresh_postings(
                    spark, postings_path,
                    deleted_paths=paths, tokenizer=tokenizer,
                )
    # the SAME append discipline as batch ingest (one sorted file per
    # bucket) — a hand-rolled partitionBy here would write one unsorted
    # file per (task, bucket) pair each micro-batch and break the
    # row-group pruning neighbor reads rely on
    try:
        with attribute_mutations(table_path) if attributed else nullcontext():
            write_chunks(chunks, table_path, mode="append")
        if postings_path is not None:
            mode = "append" if os.path.isdir(postings_path) else "overwrite"
            write_postings(
                chunks, postings_path, tokenizer=tokenizer, mode=mode, n_buckets=nb
            )
    finally:
        # also on the failure paths: a long-lived watcher must not
        # accumulate one pinned micro-batch cache per failed batch
        chunks.unpersist()
    if postings_path is not None:
        # restart handshake: the appended index covers the just-bumped
        # table version, so an engine opened on this table later trusts
        # the index instead of scheduling a full rebuild
        from ..plans.ingest import table_version, write_table_meta

        tv = table_version(table_path)
        if tv is not None:
            write_table_meta(
                postings_path,
                table_n_buckets(postings_path),
                extra={"covers_table_version": tv},
            )
        # stamp landed: close THIS batch's crash window only — a scoped
        # retire, because a blanket clear would erase a pre-existing
        # intent (a crashed engine mutation's paths, or a torn
        # optimize()'s refreshing flag) that this batch never
        # re-derived, and the covers stamp above would then present the
        # index as fresh with no recovery trigger left
        retire_fts_paths(table_path, batch_paths, stamped=tv is not None)


def stream_ingest(
    spark: SparkSession,
    watch_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    pattern: str = "*.{md,txt}",
    dim: int | None = None,
    backend: str | None = None,
    postings_path: str | None = None,
    tokenizer: str = "unigram",
    max_files_per_trigger: int = 100,
    available_now: bool = False,
):
    """Watch a directory; parse+chunk+embed new files into the chunks table.

    Returns the StreamingQuery. Uses the text source with wholetext so each
    file is one row; the path comes from input_file_name(). Non-utf8 /
    unsupported formats belong in a binaryFile batch sweep — the streaming
    text source is the md/txt hot path.

    ``backend``/``dim`` default to the table's persisted embedding space
    (_table_meta.json, written at ingest) so streamed appends land in the
    SAME vector space as the batch-built corpus — a watcher appending
    pseudo-64 vectors to a hashing- or model-embedded table would make
    every later query distance against those rows meaningless.

    ``postings_path`` keeps the persisted BM25 index warm per micro-batch
    (append-only — see _append_chunk_batch), so hybrid search over the
    table never waits for a batch optimize() to see streamed documents.
    """
    from ..plans.ingest import build_chunks, table_embedding
    from ..sources.parsers import title_udf

    raw = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(watch_dir)
        .select(
            _uri_to_path(F.input_file_name()).alias("path"),
            F.col("value").alias("text"),
        )
    )

    _title = title_udf()

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty() or _batch_already_applied(checkpoint_dir, batch_id):
            return
        # resolve the table's embedding space PER BATCH, not at stream
        # construction: a watcher started before the table exists (or
        # across a re-embed) would otherwise append foreign-space vectors
        # for its whole lifetime
        meta_backend, meta_dim = table_embedding(table_path)
        b = backend if backend is not None else meta_backend
        d = dim if dim is not None else meta_dim
        docs = batch.select(
            "path",
            "text",
            _title("path", "text").alias("title"),
            F.lower(F.sha2(F.col("text").cast("binary"), 256)).alias("contentHash"),
            # BYTE length (octet_length), matching batch ingest's raw-file
            # length — F.length counts characters and diverges on
            # multi-byte UTF-8, making fileSize ingest-path-dependent
            F.octet_length("text").cast("long").alias("length"),
        )
        chunks = build_chunks(docs, dim=d, backend=b)
        _append_chunk_batch(chunks, table_path, postings_path, tokenizer)
        _mark_batch_applied(checkpoint_dir, batch_id)

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_binary(
    spark: SparkSession,
    watch_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    pattern: str = "*.{pdf,docx,html}",
    dim: int | None = None,
    backend: str | None = None,
    postings_path: str | None = None,
    tokenizer: str = "unigram",
    max_files_per_trigger: int = 20,
    available_now: bool = False,
):
    """Binary-format watcher: the ``binaryFile`` streaming source feeds the
    SAME parse_files -> build_chunks pipeline as batch ingest, so PDFs and
    DOCX stream in with full title chains and header/footer strip.
    Unparseable files are dropped with their parse_error recorded in the
    batch, never failing the stream (coverage, not crash).

    The default pattern deliberately EXCLUDES md/txt: those are the text
    watcher's scope (``stream_ingest``), and both watchers on one directory
    with overlapping globs would double-ingest every md/txt file — the
    append-only stream path has no replace/dedup semantics to undo that.

    ``backend``/``dim`` default to the table's persisted embedding space,
    and ``postings_path`` appends the batch's postings to the BM25 index —
    same rationale as ``stream_ingest``."""
    from ..plans.ingest import build_chunks, table_embedding
    from ..sources.parsers import parse_files

    raw = (
        spark.readStream.format("binaryFile")
        # streaming sources require the schema up front; binaryFile's is fixed
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(watch_dir)
        # binaryFile's path column is a PLAIN path behind a 'file:' scheme
        # — NOT percent-encoded (verified: 'with space.txt' arrives
        # literal), unlike input_file_name() in the text watcher. The same
        # anchored scheme strip as batch read_files keeps the two ingest
        # paths key-compatible; unquoting here would corrupt literal-%
        # names, and an unanchored replace would mangle names containing
        # 'file:'.
        .selectExpr("regexp_replace(path, '^file:', '') AS path", "content")
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty() or _batch_already_applied(checkpoint_dir, batch_id):
            return
        # per-batch embedding-space resolution — same rationale as
        # stream_ingest
        meta_backend, meta_dim = table_embedding(table_path)
        b = backend if backend is not None else meta_backend
        d = dim if dim is not None else meta_dim
        hashed = batch.withColumn(
            "contentHash", F.lower(F.sha2(F.col("content"), 256))
        ).withColumn("length", F.length("content").cast("long"))
        parsed = parse_files(hashed).join(
            hashed.select("path", "contentHash", "length"), "path"
        )
        docs = parsed.filter(F.col("parse_error").isNull())
        chunks = build_chunks(docs, dim=d, backend=b)
        _append_chunk_batch(chunks, table_path, postings_path, tokenizer)
        _mark_batch_applied(checkpoint_dir, batch_id)

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str | None = "value",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked (sliding) window counts — works on a stream or a batch DF.

    On a stream the watermark bounds state: late rows beyond it are dropped
    and window state is evicted — the knob that keeps 100 TB/day of events
    from accumulating unbounded state. ``value_col=None`` (or a column the
    frame lacks) skips the value sum — counts only.
    """
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    df = events
    if events.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    aggs = [F.count("*").alias("n")]
    if value_col is not None and value_col in events.columns:
        aggs.append(F.sum(value_col).alias("total_value"))
    return df.groupBy(win.alias("win"), F.col(key_col)).agg(*aggs)


def dedupe_event_stream(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exactly-once event dedup — the ingestion guard in front of
    every at-least-once delivery source (Kafka replays, retried producers).

    ``dropDuplicatesWithinWatermark`` keeps one row per key while only
    retaining state inside the watermark horizon: duplicates arriving
    within ``watermark`` of the first sighting are dropped, and the per-key
    state is evicted once the watermark passes it — bounded state at any
    throughput, unlike a plain dropDuplicates whose state grows forever.

    Works on a batch DataFrame too (plain dropDuplicates on the keys) so
    the batch backfill and the streaming path share one call site.
    """
    if not events.isStreaming:
        return events.dropDuplicates(list(key_cols))
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def join_event_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "30 minutes",
    max_delay: str = "15 minutes",
) -> DataFrame:
    """Stream-stream interval join — attribute each right-side event to the
    left-side event it followed within ``max_delay`` (e.g. purchases to the
    view that preceded them). The classic funnel/attribution join that a
    batch engine does with an as-of or range join (operators/asof.py).

    State stays bounded only because BOTH sides carry a watermark AND the
    join condition constrains the two event times to a finite interval —
    Spark derives the state-eviction horizon from that pair; drop either
    one and the join buffers both streams forever (at 100 TB/day that is
    the difference between a runnable job and an OOM loop).

    Columns: the right side's non-key columns come back prefixed ``r_`` so
    the caller never hits ambiguous-column resolution; the left side keeps
    its names (its ts as ``l_ts``). Works identically on batch frames (no
    watermarks applied) so backfills share this call site.
    """
    l = left.withColumnRenamed(left_ts, "l_ts")
    r = right.withColumnRenamed(right_ts, "r_ts")
    r = r.select(
        F.col(key_col),
        "r_ts",
        *[
            F.col(c).alias(f"r_{c}")
            for c in r.columns
            if c not in (key_col, "r_ts")
        ],
    )
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    # alias both sides so the key equality survives self-join lineage (both
    # frames filtered from the same parent would otherwise resolve to the
    # same attribute and collapse to a trivially-true predicate)
    l, r = l.alias("_ssl"), r.alias("_ssr")
    cond = (
        (F.col(f"_ssl.{key_col}") == F.col(f"_ssr.{key_col}"))
        & (F.col("_ssr.r_ts") >= F.col("_ssl.l_ts"))
        & (F.col("_ssr.r_ts") <= F.col("_ssl.l_ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    return l.join(r, cond, "inner").drop(F.col(f"_ssr.{key_col}"))


def stream_ingest_shards(
    spark: SparkSession,
    watch_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    pattern: str = "*.tar",
    dim: int | None = None,
    backend: str | None = None,
    postings_path: str | None = None,
    tokenizer: str = "unigram",
    max_files_per_trigger: int = 4,
    available_now: bool = False,
):
    """WebDataset watcher: new tar SHARDS dropped into the directory
    stream through the same member-expand -> text-member-pick ->
    parse -> chunk chain as batch ``ingest_webdataset``. The file source
    tracks processed shards in the checkpoint (exactly-once per shard,
    restart-safe), and a shard is the micro-batch work unit — at corpus
    scale the drop directory IS the delivery interface, shards arriving
    from the producer as they close. maxFilesPerTrigger defaults low
    because one shard already fans out to thousands of samples.

    Compressed shards match by glob (pass ``pattern="*.tar*"`` to watch
    gz/bz2/xz envelopes too); unparseable members are dropped with their
    parse_error recorded, and a corrupt/oversized SHARD becomes a
    ``__corrupt__`` member row instead of an exception (expand_shards
    errors='record') — a foreachBatch failure would otherwise replay the
    same checkpointed file list forever, wedging the stream on one bad
    producer copy.

    Each batch's shards register in the table's ``shard_containers``
    property (path -> content sha256) BEFORE their rows land, the same
    membership record batch ``ingest_shards`` writes: the engine's
    directory ``sync()`` shields shard-member rows by that membership, so
    an unregistered streamed shard's rows would classify as prune on the
    next routine sync and silently vanish. Registration-first ordering
    means a crash between the two steps leaves a registered shard with
    missing rows — which the replayed (unmarked) micro-batch re-appends —
    never unshielded rows a sync could destroy.

    Shards are IMMUTABLE BY NAME to this watcher: Spark's file source
    tracks paths in the checkpoint, so a producer re-dropping a corrected
    shard under the SAME name is never reprocessed and the first copy's
    rows persist. Corrected shards must arrive under a new name; for
    in-place replacement semantics run ``engine.sync_shards`` (hash-based
    change detection) over the directory instead."""
    from ..plans.ingest import build_chunks, table_embedding
    from ..sources.parsers import parse_files
    from ..sources.webdataset import expand_shards, pick_text_members

    raw = (
        spark.readStream.format("binaryFile")
        .schema("path string, modificationTime timestamp, length long, content binary")
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(watch_dir)
        # same anchored scheme strip as stream_ingest_binary (binaryFile
        # paths are plain, not percent-encoded)
        .selectExpr("regexp_replace(path, '^file:', '') AS path", "content")
    )

    def _process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty() or _batch_already_applied(checkpoint_dir, batch_id):
            return
        meta_backend, meta_dim = table_embedding(table_path)
        b = backend if backend is not None else meta_backend
        d = dim if dim is not None else meta_dim
        # membership registration FIRST (see docstring): hash each shard
        # distributed, one bounded row per shard back to the driver
        # (≤ maxFilesPerTrigger rows), then merge into the persisted
        # property before any row append. CORRUPT shards are NOT
        # registered (r14 review): recording their hash would make every
        # later batch sync_shards classify them 'unchanged' and the
        # corruption would become permanently invisible — unregistered,
        # the batch path re-expands and re-warns, its stated contract.
        # A corrupt shard contributes no rows, so there is nothing for
        # the prune shield to protect either.
        from ..sources.webdataset import CORRUPT_SLOT

        # expand ONCE and persist: the corrupt-flag stats aggregate and
        # pick_text_members both consume the member rows, and expansion
        # decompresses + walks every shard tar — paying that twice per
        # micro-batch doubles the stream's dominant cost. The content sha
        # comes straight from the raw batch bytes (no expansion needed).
        members = expand_shards(batch, errors="record").persist()
        try:
            stats = {
                r["path"]: (r["sha"], bool(r["corrupt"]))
                for r in members.groupBy(F.col("shard").alias("path"))
                .agg(
                    F.max(
                        (F.col("slot") == F.lit(CORRUPT_SLOT)).cast("int")
                    ).alias("corrupt")
                )
                .join(
                    batch.select(
                        "path", F.lower(F.sha2("content", 256)).alias("sha")
                    ),
                    "path",
                )
                .collect()
            }
            _register_shard_containers(
                table_path,
                {p: sha for p, (sha, corrupt) in stats.items() if not corrupt},
            )
            picked = pick_text_members(members)
            hashed = picked.withColumn(
                "contentHash", F.lower(F.sha2(F.col("content"), 256))
            )
            parsed = parse_files(hashed).join(
                hashed.select("path", "contentHash", "length"), "path"
            )
            docs = parsed.filter(F.col("parse_error").isNull())
            chunks = build_chunks(docs, dim=d, backend=b)
            _append_chunk_batch(chunks, table_path, postings_path, tokenizer)
            _mark_batch_applied(checkpoint_dir, batch_id)
        finally:
            members.unpersist()

    writer = raw.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
