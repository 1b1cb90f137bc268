"""Event-stream analytics shapes a training-data / product pipeline needs
beyond plain windows: ordered funnels, cohort retention, top-k per group,
and conditional-rate scans. All over the driver's ``events`` table
(TIMESTAMP_NANOS — must be read via session.load).

Determinism: ``value`` is a double, so money-style sums go through
DECIMAL(18,6); ratios are round(x, 6); ranked outputs carry a unique
tie-break key (user_id).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..session import load
from .common import register

DEC6 = "decimal(18,6)"


# Ordered funnel: view -> click-after-view -> purchase-after-click.
# Each stage is a min-timestamp aggregate joined with a strict ts
# inequality — the relational twin of a stateful sequence matcher.

@register(
    "events_funnel",
    """WITH v AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT 'stage1_view' AS stage, (SELECT count(*) FROM v)::BIGINT AS users
UNION ALL SELECT 'stage2_click', (SELECT count(*) FROM c)::BIGINT
UNION ALL SELECT 'stage3_purchase', (SELECT count(*) FROM p)::BIGINT
ORDER BY stage""",
)
def q_events_funnel(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_buy"))
    )
    stages = [("stage1_view", v), ("stage2_click", c), ("stage3_purchase", p)]
    out = None
    for name, df in stages:
        row = df.agg(
            F.lit(name).alias("stage"), F.count("*").alias("users")
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("stage")


# Cohort retention: users bucketed by first-seen day; day-1 / day-7
# return rates. Two-level aggregate over a self-join on activity days.

@register(
    "events_retention",
    """WITH first_seen AS (
  SELECT user_id, date_trunc('day', min(ts)) AS d0 FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
)
SELECT f.d0 AS cohort_day,
       count(DISTINCT f.user_id)::BIGINT AS cohort_size,
       count(DISTINCT CASE WHEN a.d = f.d0 + INTERVAL 1 DAY THEN f.user_id END)::BIGINT AS retained_d1,
       count(DISTINCT CASE WHEN a.d = f.d0 + INTERVAL 7 DAY THEN f.user_id END)::BIGINT AS retained_d7
FROM first_seen f JOIN activity a ON a.user_id = f.user_id
GROUP BY cohort_day ORDER BY cohort_day""",
)
def q_events_retention(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("d0")
    )
    activity = e.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    return (
        first_seen.join(activity, "user_id")
        .groupBy(F.col("d0").alias("cohort_day"))
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(
                    F.col("d") == F.col("d0") + F.expr("INTERVAL 1 DAY"),
                    F.col("user_id"),
                )
            ).alias("retained_d1"),
            F.countDistinct(
                F.when(
                    F.col("d") == F.col("d0") + F.expr("INTERVAL 7 DAY"),
                    F.col("user_id"),
                )
            ).alias("retained_d7"),
        )
        .orderBy("cohort_day")
    )


# Top-k per group: top-3 spenders per event type (dense window rank with
# a unique tie-break; exact DECIMAL sums keep rank stable across engines).

@register(
    "events_topk_per_group",
    """SELECT event_type, user_id, total_value, rk
FROM (
  SELECT event_type, user_id,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY sum(CAST(value AS DECIMAL(18,6))) DESC, user_id) AS rk
  FROM events GROUP BY event_type, user_id
) t WHERE rk <= 3 ORDER BY event_type, rk""",
)
def q_events_topk_per_group(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast(DEC6)).alias("_tv")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("_tv").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "event_type",
            "user_id",
            F.col("_tv").cast("double").alias("total_value"),
            "rk",
        )
        .orderBy("event_type", "rk")
    )


# Conditional-rate scan: daily error share — single-pass conditional
# aggregation, the streaming-dashboard shape as a batch query.

@register(
    "events_error_rate",
    """SELECT date_trunc('day', ts) AS day,
       count(*)::BIGINT AS n_events,
       sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors,
       round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS error_rate
FROM events GROUP BY day ORDER BY day""",
)
def q_events_error_rate(spark, sf_dir):
    e = load(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(is_err).alias("n_errors"),
            F.round(F.sum(is_err) / F.count("*"), 6).alias("error_rate"),
        )
        .orderBy("day")
    )
