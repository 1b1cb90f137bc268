"""Watermarked stream-stream interval joins — click attribution, in both
canonical shapes: INNER (attributed pairs only) and LEFT-OUTER
(unattributed impressions emitted with null click columns once the
watermark proves no click can still arrive).

The two-stream pattern Structured Streaming was built for: an
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


def attribute_impressions_batch_outer(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    window_seconds: int = DEFAULT_WINDOW_S,
) -> DataFrame:
    """Batch twin of the LEFT-OUTER attribution shape: every impression
    emitted exactly once per matching click, or once with null click
    columns when no click lands in its window. Spark plans the same
    user-keyed equi-join with the range post-filter; the outer side adds
    no shuffle."""
    imp = impressions.alias("imp")
    clk = clicks.alias("clk")
    return _project(
        imp.join(clk, _attribution_condition(window_seconds), "left_outer")
    )


def unattributed_impressions_batch(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    window_seconds: int = DEFAULT_WINDOW_S,
) -> DataFrame:
    """Impressions with NO click inside the attribution window — the rows
    the streaming outer join emits at watermark expiry. A left_anti join
    beats filtering the outer join's nulls: the anti form never
    materializes the matched fan-out at all (an impression with 50 clicks
    contributes 50 joined rows to the outer shape, zero here)."""
    imp = impressions.alias("imp")
    clk = clicks.alias("clk")
    return imp.join(
        clk, _attribution_condition(window_seconds), "left_anti"
    ).select(
        F.col("user_id"),
        F.col("event_id").alias("impression_id"),
        F.col("ts").alias("impression_ts"),
    )


def attribute_impressions_stream_outer(
    impressions: DataFrame,
    clicks: DataFrame,
    *,
    window_seconds: int = DEFAULT_WINDOW_S,
    lateness: str = DEFAULT_LATENESS,
) -> DataFrame:
    """Streaming LEFT-OUTER interval join — the other canonical
    stream-stream shape: attributed rows emit as matches arrive, and an
    impression that the click watermark has passed WITHOUT a match emits
    once with null click columns (Structured Streaming's outer-join
    contract: null results are produced only when the watermark proves no
    future match is possible, so the emission lags by the watermark
    delay). State stays bounded by the same rule as the inner form —
    watermarks on BOTH sides + the interval condition give the eviction
    clock. Callers draining with availableNow must push a final watermark
    past the last window (e.g. a sentinel event) or trailing unmatched
    impressions stay in state when the query stops."""
    imp = impressions.withWatermark("ts", lateness).alias("imp")
    clk = clicks.withWatermark("ts", lateness).alias("clk")
    return _project(
        imp.join(clk, _attribution_condition(window_seconds), "leftOuter")
    )
