"""Streaming ingest (availableNow drain) and watermarked windows."""

import time


def test_stream_ingest_available_now(spark, tmp_path):
    from mcp_local_rag_spark.streaming.watch import stream_ingest

    watch = tmp_path / "drop"
    watch.mkdir()
    (watch / "a.txt").write_text(
        "Stream Doc\n\nA sufficiently long first sentence about streaming ingestion pipelines.\n"
    )
    (watch / "b.txt").write_text(
        "body line one without a blank after it\nso the title falls back to the filename and this text is long enough.\n"
    )
    table = str(tmp_path / "chunks")
    ckpt = str(tmp_path / "ckpt")

    q = stream_ingest(spark, str(watch), table, ckpt, available_now=True)
    q.awaitTermination(120)
    stored = spark.read.parquet(table)
    assert stored.count() >= 2
    assert {r.fileTitle for r in stored.collect()} == {"Stream Doc", "b"}

    # exactly-once: draining again with the same checkpoint adds nothing
    q2 = stream_ingest(spark, str(watch), table, ckpt, available_now=True)
    q2.awaitTermination(120)
    spark.catalog.refreshByPath(table)
    assert spark.read.parquet(table).count() == stored.count()

    # a NEW file gets picked up incrementally
    (watch / "c.txt").write_text(
        "Third document appended later with enough characters to form one chunk easily.\n"
    )
    q3 = stream_ingest(spark, str(watch), table, ckpt, available_now=True)
    q3.awaitTermination(120)
    spark.catalog.refreshByPath(table)
    assert spark.read.parquet(table).filter("filePath LIKE '%c.txt'").count() >= 1


def test_windowed_event_counts_batch_twin(spark):
    from mcp_local_rag_spark.streaming.watch import windowed_event_counts

    rows = [
        ("2026-01-01 00:01:00", "click", 1.0),
        ("2026-01-01 00:05:00", "click", 2.0),
        ("2026-01-01 00:15:00", "click", 4.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").selectExpr(
        "CAST(ts AS TIMESTAMP) ts", "event_type", "value"
    )
    out = {
        (str(r.win.start), r.event_type): (r.n, r.total_value)
        for r in windowed_event_counts(df, window="10 minutes").collect()
    }
    assert out[("2026-01-01 00:00:00", "click")] == (2, 3.0)
    assert out[("2026-01-01 00:10:00", "click")] == (1, 4.0)
