"""Watermarked stream-stream interval join — click attribution.

The canonical two-stream pattern Structured Streaming was built for: an
impressions stream joined to a clicks stream on user with the click
falling inside an attribution window after the impression. Both sides
carry event-time watermarks, and the join's time-interval condition is
what lets Spark BOUND the state it must retain for each side — without
the interval bound a stream-stream inner join would buffer both streams
forever (the documented requirement; the watermark + range condition
together give the engine an eviction rule).

Semantics twin: `attribute_clicks_batch` runs the identical join as a
plain DataFrame — the availableNow drain of the streaming form equals
the batch result row-for-row (pytest-pinned), which is the same
batch/streaming-parity discipline as streaming/sessionize and
streaming/dedup.

Scale posture: the join shuffles both sides on user_id once; state per
side is bounded by (watermark delay + attribution window) x arrival
rate, the knob a 100 TB/day event feed needs. Output rows carry the
attribution latency for downstream windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW_S = 1800  # 30 min attribution window
DEFAULT_LATENESS = "10 minutes"


def _attribution_condition(window_seconds: int):
    return (
        (F.col("imp.user_id") == F.col("clk.user_id"))
        & (F.col("clk.ts") >= F.col("imp.ts"))
        & (F.col("clk.ts") <= F.col("imp.ts") + F.expr(f"interval {window_seconds} seconds"))
    )


def _project(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("imp.user_id").alias("user_id"),
        F.col("imp.event_id").alias("impression_id"),
        F.col("clk.event_id").alias("click_id"),
        F.col("imp.ts").alias("impression_ts"),
        F.col("clk.ts").alias("click_ts"),
        (
            F.col("clk.ts").cast("double") - F.col("imp.ts").cast("double")
        ).alias("latency_s"),
    )


def attribute_clicks_batch(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    window_seconds: int = DEFAULT_WINDOW_S,
) -> DataFrame:
    """The batch twin: same condition, plain inner join. Spark plans it as
    a user-keyed equi-join with the range condition as a post-filter —
    one shuffle per side, never a theta-join cartesian."""
    imp = impressions.alias("imp")
    clk = clicks.alias("clk")
    return _project(imp.join(clk, _attribution_condition(window_seconds)))


def attribute_clicks_stream(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    window_seconds: int = DEFAULT_WINDOW_S,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Streaming form over two ``readStream`` frames with ``ts`` event
    time. Watermarks on BOTH sides + the interval condition bound the
    join state; late events past ``lateness`` are dropped by contract."""
    imp = impressions.withWatermark("ts", lateness).alias("imp")
    clk = clicks.withWatermark("ts", lateness).alias("clk")
    return _project(imp.join(clk, _attribution_condition(window_seconds)))
