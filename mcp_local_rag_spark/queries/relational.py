"""Relational-core paired queries over the TPC-H-ish star tables and events.

Covers SURVEY §2 scans (S1-S4), aggregations (A1-A8), windows (W4-W7),
joins (J3/J4 shapes), set ops (U1-U5), and the streaming-ish batch shapes
(sessionization, tumbling windows) over `events`.

Determinism note on big float sums: a SUM over 600k doubles is
order-dependent, so money-style sums are computed by casting each row's
product to DECIMAL (exact, associative) and casting the final sum back to
DOUBLE — both engines then produce bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..session import load
from .common import register

# ---------------------------------------------------------------------------
# S1: projection scan (column pruning reaches the parquet reader)

@register(
    "scan_projection",
    "SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'O'",
)
def q_scan_projection(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderdate")
    )


# A1: per-file group-by (count + max) — the reference hand-rolls this loop

@register(
    "agg_per_file",
    """SELECT source, count(*)::BIGINT AS chunk_count,
       max(n_chars) AS max_chars, min(doc_id) AS first_doc
FROM documents GROUP BY source""",
)
def q_agg_per_file(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.count("*").alias("chunk_count"),
            F.max("n_chars").alias("max_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# A2/S4: corpus status — row count + exact distinct count

@register(
    "corpus_stats",
    """SELECT count(*)::BIGINT AS n_chunks,
       count(DISTINCT source)::BIGINT AS n_documents,
       round(avg(n_chars), 6) AS avg_chars
FROM documents""",
)
def q_corpus_stats(spark, sf_dir):
    return load(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_chunks"),
        F.countDistinct("source").alias("n_documents"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


# A6/A7: exact interpolated percentiles per group

@register(
    "percentile_by_lang",
    """SELECT lang, round(quantile_cont(n_chars, 0.5), 6) AS median_chars,
       round(quantile_cont(n_chars, 0.95), 6) AS p95_chars
FROM documents GROUP BY lang""",
)
def q_percentile_by_lang(spark, sf_dir):
    return (
        load(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("median_chars"),
            F.round(F.percentile("n_chars", F.lit(0.95)), 6).alias("p95_chars"),
        )
    )


# TPC-H Q1 shape: wide aggregation; decimal-cast products for exact sums

@register(
    "tpch_q1_pricing",
    """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def q_tpch_q1(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("sum_base_price"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
        ).cast("double").alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


# TPC-H Q3 shape: 3-way join + top-k by revenue

@register(
    "tpch_q3_topk",
    """SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10""",
)
def q_tpch_q3(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue", "o_orderdate")
    )


# TPC-H Q5 shape: star join through region/nation (broadcast dims)

@register(
    "tpch_q5_region",
    """SELECT n.n_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
WHERE r.r_regionkey IN (0, 1)
GROUP BY n.n_name""",
)
def q_tpch_q5(spark, sf_dir):
    r = load(spark, sf_dir, "region").filter(F.col("r_regionkey").isin(0, 1))
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    dims = s.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                  s.s_nationkey == n.n_nationkey)
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )


# TPC-H Q6 shape: highly selective scan-side filters (pushdown showcase)

@register(
    "tpch_q6_selective",
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*)::BIGINT AS n
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
  AND l_shipdate >= TIMESTAMP '1995-01-01'""",
)
def q_tpch_q6(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
            & (F.col("l_shipdate") >= "1995-01-01")
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)")
            ).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


# TPC-H Q18 shape: group-having subquery (large-order customers)

@register(
    "tpch_q18_big_orders",
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       CAST(big.qty AS DOUBLE) AS total_qty
FROM orders o
JOIN (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
) big ON big.l_orderkey = o.o_orderkey""",
)
def q_tpch_q18(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > 120)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return o.join(big, o.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_custkey", "o_totalprice", "total_qty"
    )


# J4 shape: orphan anti-join (customers with no orders)

@register(
    "orphan_customers",
    """SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q_orphan_customers(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# P3 shape: IN-list / semi-join restriction, then aggregate

@register(
    "semi_join_candidates",
    """SELECT l_returnflag, count(*)::BIGINT AS n
FROM lineitem
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
GROUP BY l_returnflag""",
)
def q_semi_join_candidates(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


# W4 shape: per-group top-n with a total-order rank

@register(
    "window_rank_orders",
    """SELECT o_orderpriority, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t WHERE rn <= 5""",
)
def q_window_rank_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


# U1 shape: first-occurrence-wins dedup (deterministic via row_number)

@register(
    "first_event_per_user",
    """SELECT user_id, event_type, event_id, ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id) AS rn
  FROM events
) t WHERE rn = 1""",
)
def q_first_event_per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# U5 shape: distinct + deterministic sort

@register(
    "distinct_event_types",
    "SELECT DISTINCT event_type FROM events ORDER BY event_type",
)
def q_distinct_event_types(spark, sf_dir):
    return load(spark, sf_dir, "events").select("event_type").distinct().orderBy("event_type")


# U4 shape: set-difference chain via anti join

@register(
    "viewers_never_purchased",
    """SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
AND user_id NOT IN (SELECT user_id FROM events WHERE event_type = 'purchase')""",
)
def q_viewers_never_purchased(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.join(buyers, "user_id", "left_anti")


# Streaming-shaped batch: sessionization (30-min inactivity gap).
# In Structured Streaming this is session_window(ts, '30 minutes'); the
# batch twin uses the lag/cumsum formulation so the oracle can check it.

@register(
    "events_sessionize",
    """WITH flagged AS (
  SELECT user_id, event_id, ts, epoch(ts) AS es,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, event_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id""",
)
def q_events_sessionize(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.col("ts").cast("double")
    flagged = ev.withColumn(
        "new_sess",
        F.when(es - F.lag(es).over(w) > 1800, 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# Streaming-shaped batch: tumbling hourly window aggregate

@register(
    "events_hourly",
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2""",
)
def q_events_hourly(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), F.col("event_type")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )


# JSON prop extraction (events.props is a JSON string)

@register(
    "events_json_extract",
    """SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
FROM events GROUP BY event_type""",
)
def q_events_json_extract(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).alias("k_sum")
    )


# The NATIVE sessionization operator: session_window merges events whose
# [ts, ts+gap) windows overlap — the same batch call works on a stream
# (where it is backed by state-store session merging, the scalable path).
# Split semantics differ from the lag/cumsum twin at EXACTLY gap seconds
# (window [t, t+gap) does not include t+gap), so the oracle splits on
# >= gap. Sampled to user_id % 100 = 0 to bound the compare frame.

@register(
    "events_session_window_native",
    """WITH ev AS (
  SELECT user_id, event_id, ts FROM events WHERE user_id % 100 = 0
),
flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL 1800 SECOND AS session_end,
       count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start""",
)
def q_events_session_window_native(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )
