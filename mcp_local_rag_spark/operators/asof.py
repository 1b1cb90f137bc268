"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Neither exists in the reference (SURVEY §2.3: "No theta/range/as-of/
interval joins exist in the reference. Equi-joins only") — these are the
training-pipeline extensions for event-shaped data, built as compositions
of DataFrame ops so Catalyst keeps optimizing them:

  * ``asof_join_backward`` — the union + running-last trick: ONE shuffle
    on the partition key, no range condition at all. The naive formulation
    (t1.ts >= t2.ts theta join) is a BroadcastNestedLoopJoin — O(n*m) per
    key and a non-starter at scale.
  * ``bucketed_range_join`` — bounded-window range join as an equi-join on
    (key, time bucket): the probe side fans out to the few buckets its
    window can overlap, the join is hash-based, and the exact range check
    runs post-join. Fan-out = ceil(window/bucket)+1 rows, constant.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: Sequence[str] = (),
    tiebreak: str | None = None,
    out_ts: str = "asof_ts",
) -> DataFrame:
    """For every left row, the most recent right row with
    ``right.ts <= left.ts`` within the same ``on`` group (backward as-of,
    inclusive — DuckDB ``ASOF JOIN ... ON l.ts >= r.ts`` semantics).
    Unmatched left rows keep NULLs (LEFT ASOF).

    ``tiebreak`` totally orders right rows that share a timestamp (e.g. a
    unique event id) so payload columns are deterministic; without it only
    ``out_ts`` (the max matching timestamp) is deterministic.

    Plan shape: union → one window over (on, ORDER BY ts, side, tiebreak)
    with a running last_value(ignoreNulls) → filter left side. One shuffle
    on ``on``; per-row state is O(1) — this is the batch twin of a
    stream-stream as-of with keyed state.
    """
    on = list(on)
    # the tiebreak orders RIGHT rows; left rows never need one — selecting
    # it from the left frame would crash when left lacks the column (or
    # silently order by an unrelated same-named column), so left carries a
    # typed NULL in that slot
    tb_l = (
        F.lit(0)
        if tiebreak is None
        else F.lit(None).cast(right.schema[tiebreak].dataType)
    )
    payload = list(right_payload)

    r = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.lit(0) if tiebreak is None else F.col(tiebreak)).alias("_tb"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in payload],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left.columns
            if c not in on and c != left_ts
        ],
    )
    l = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        tb_l.alias("_tb"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in payload
        ],
        *[F.col(c).alias(f"_l_{c}") for c in left.columns if c not in on and c != left_ts],
    )
    # right rows sort before left at equal ts (side 0 < 1) => inclusive <=
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [F.last("_r_ts", ignorenulls=True).over(w).alias(out_ts)] + [
        F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{out_ts}_{c}")
        for c in payload
    ]
    u = r.unionByName(l)
    out_cols = (
        on
        + [F.col("_ts")]
        + [F.col(f"_l_{c}").alias(c) for c in left.columns if c not in on and c != left_ts]
    )
    return (
        u.select(*out_cols, "_side", *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
        .withColumnRenamed("_ts", left_ts)
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_seconds: int = 3600,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Pairs (left, right) with ``right.ts in [left.ts - window, left.ts)``
    and equal ``on`` keys, WITHOUT an O(n*m) nested-loop join.

    The left side explodes into the ceil(window/bucket)+1 time buckets its
    window can overlap; the join is then a plain equi-join on
    (on..., bucket) and the exact range predicate filters after. At 100 TB
    this shuffles each side once on (key, bucket) — AQE splits hot buckets.
    """
    on = list(on)
    # ceiling division: a window that is not a whole number of buckets still
    # overlaps the oldest partial bucket
    n_buckets = -(-window_seconds // bucket_seconds) + 1
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / bucket_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_seconds)

    l = left.withColumn(
        "_bucket",
        F.explode(F.sequence(lb - n_buckets + 1, lb)),
    )
    r = right.withColumn("_bucket", rb)
    lo = F.col(left_ts) - F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
    joined = l.join(r, [*on, "_bucket"]).filter(
        (F.col(right_ts) >= lo) & (F.col(right_ts) < F.col(left_ts))
    )
    return joined.drop("_bucket")
