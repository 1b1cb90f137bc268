"""Unit semantics for the temporal-join operators (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from mcp_local_rag_spark.operators.asof import asof_join_backward, bucketed_range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100),
         (1, _ts("2024-01-01 12:00:00"), 101),
         (2, _ts("2024-01-01 09:00:00"), 102)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 7.0, 1),   # equal ts -> matches (inclusive)
         (1, _ts("2024-01-01 11:00:00"), 8.0, 2),
         (1, _ts("2024-01-01 11:00:00"), 9.0, 3)],  # tie on ts -> higher id wins
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = {
        r["event_id"]: r
        for r in asof_join_backward(
            left, right, on=["user_id"], right_payload=("value",),
            tiebreak="event_id", out_ts="m_ts",
        ).collect()
    }
    assert out[100]["m_ts"] == _ts("2024-01-01 10:00:00")   # ts == matches
    assert out[100]["m_ts_value"] == 7.0
    assert out[101]["m_ts"] == _ts("2024-01-01 11:00:00")
    assert out[101]["m_ts_value"] == 9.0                     # tiebreak: last id
    assert out[102]["m_ts"] is None                          # no earlier right row


def test_bucketed_range_join_window_bounds(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        "user_id long, p_ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1),   # exactly -window  -> included
         (1, _ts("2024-01-01 08:59:59"), 2),   # just outside     -> excluded
         (1, _ts("2024-01-01 09:59:59"), 3),   # inside           -> included
         (1, _ts("2024-01-01 10:00:00"), 4),   # equal to left ts -> excluded
         (2, _ts("2024-01-01 09:30:00"), 5)],  # other key        -> excluded
        "user_id long, c_ts timestamp, c_id long",
    )
    got = sorted(
        r["c_id"]
        for r in bucketed_range_join(
            left, right, on=["user_id"], left_ts="p_ts", right_ts="c_ts",
            window_seconds=3600, bucket_seconds=600,
        ).collect()
    )
    assert got == [1, 3]


def test_bucketed_range_join_non_divisible_window(spark):
    """window=5400 with bucket=3600: the oldest overlapping (partial) bucket
    must not be dropped — requires ceil(window/bucket)+1 probe buckets."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 100)],
        "user_id long, p_ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 08:30:00"), 1),   # exactly -window -> included
         (1, _ts("2024-01-01 08:29:59"), 2),   # just outside    -> excluded
         (1, _ts("2024-01-01 08:45:00"), 3)],  # oldest partial bucket -> included
        "user_id long, c_ts timestamp, c_id long",
    )
    got = sorted(
        r["c_id"]
        for r in bucketed_range_join(
            left, right, on=["user_id"], left_ts="p_ts", right_ts="c_ts",
            window_seconds=5400, bucket_seconds=3600,
        ).collect()
    )
    assert got == [1, 3]
