"""Warehouse-maintenance lanes: MERGE/CDC upsert, snapshot time travel,
SCD2 history, and incremental view maintenance.

The reference's only mutation story is whole-file replace inside a
simulated transaction (src/server/index.ts:644-702); a 100 TB training
corpus needs the real warehouse verbs — apply a CDC batch as one MERGE,
read the table as-of an old snapshot, keep dimension history, and fold
deltas into rollups without recomputing them. Each lane here is
oracle-paired: the DuckDB SQL re-derives the SAME deterministic CDC batch
from the raw tables, so a hash match proves the merge/IVM machinery
(plans/merge.py, plans/ivm.py) converges to the declarative answer.

Determinism: text edits avoid case mapping (locale-dependent); money-style
sums go through DECIMAL(18,6); every output is totally ordered.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..session import load, read_parquet
from .common import register
from .rag import _scratch_path

DEC6 = "decimal(18,6)"

# ---------------------------------------------------------------------------
# Shared deterministic CDC batch over documents (both engines derive it
# from the raw table, so the partition of doc_ids must be engine-neutral):
#   updates:  doc_id % 10 == 3      -> text := 'v2:' || substr(text, 1, 40)
#   deletes:  doc_id % 13 == 7 and not an update target
#   inserts:  for doc_id % 29 == 11 -> new id = doc_id + max_id + 1,
#             source 'cdc', lang 'xx'
# (update/delete targets are disjoint and insert ids exceed max_id, so the
# source has unique keys — the MERGE precondition.)


def _cdc_source(spark: SparkSession, sf_dir: str):
    docs = load(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    new_text = F.concat(F.lit("v2:"), F.substring("text", 1, 40))
    updates = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select(
            "doc_id",
            new_text.alias("text"),
            "lang",
            "source",
            F.length(new_text).alias("n_chars"),
            F.lit(False).alias("is_delete"),
        )
    )
    deletes = (
        docs.filter((F.col("doc_id") % 13 == 7) & (F.col("doc_id") % 10 != 3))
        .select(
            "doc_id", "text", "lang", "source", "n_chars",
            F.lit(True).alias("is_delete"),
        )
    )
    ins_id = F.col("doc_id") + F.lit(max_id + 1)
    ins_text = F.concat(F.lit("synthetic insert "), ins_id.cast("string"))
    inserts = (
        docs.filter(F.col("doc_id") % 29 == 11)
        .select(
            ins_id.alias("doc_id"),
            ins_text.alias("text"),
            F.lit("xx").alias("lang"),
            F.lit("cdc").alias("source"),
            F.length(ins_text).alias("n_chars"),
            F.lit(False).alias("is_delete"),
        )
    )
    return updates.unionByName(deletes).unionByName(inserts)


def _merged_docs_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-once scratch merge table: v1 = raw documents, v2 = after the
    CDC batch. Returns the table path."""
    from ..plans.merge import create_merge_table, current_version, merge_into

    path = _scratch_path(sf_dir, "merge_docs", tables=("documents",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if current_version(path) >= 2:
                return path
        except (OSError, ValueError):
            pass
    create_merge_table(
        load(spark, sf_dir, "documents"), path, "doc_id", n_buckets=16
    )
    merge_into(spark, path, _cdc_source(spark, sf_dir), delete_col="is_delete")
    return path


def _per_source_audit(df):
    """Per-source audit row: counts, char sums, an id/char checksum, and
    the v2-text count — enough to pin the FULL merged state without
    hashing 5k text blobs through the driver compare."""
    return (
        df.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum(F.col("doc_id") * 1009 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
            F.sum(F.when(F.col("text").startswith("v2:"), 1).otherwise(0))
            .cast("long")
            .alias("n_updated"),
        )
        .orderBy("source")
    )


_AUDIT_SQL = """SELECT source, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(doc_id * 1009 + n_chars)::BIGINT AS checksum,
       sum(CASE WHEN text LIKE 'v2:%' THEN 1 ELSE 0 END)::BIGINT AS n_updated
FROM {src} GROUP BY source ORDER BY source"""


@register(
    "documents_merge_upsert",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text, lang, source,
         length('v2:' || substr(text, 1, 40)) AS n_chars
  FROM documents WHERE doc_id % 10 = 3),
ins AS (
  SELECT d.doc_id + mx.m + 1 AS doc_id,
         'synthetic insert ' || (d.doc_id + mx.m + 1) AS text,
         'xx' AS lang, 'cdc' AS source,
         length('synthetic insert ' || (d.doc_id + mx.m + 1)) AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11),
merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins)
"""
    + _AUDIT_SQL.format(src="merged"),
)
def q_documents_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics (update + delete + insert in one commit)
    against the snapshot-versioned bucketed table — the Spark-native
    answer to the reference's whole-file replace transaction
    (src/server/index.ts:644-702). Audit of the CURRENT snapshot."""
    from ..plans.merge import read_snapshot

    path = _merged_docs_table(spark, sf_dir)
    return _per_source_audit(read_snapshot(spark, path))


@register(
    "documents_merge_time_travel",
    _AUDIT_SQL.format(src="documents"),
)
def q_documents_merge_time_travel(spark, sf_dir):
    """Time travel: read snapshot v1 of the SAME table the CDC merge has
    since rewritten — the oracle is the raw documents table, so a hash
    match proves old versions are bit-stable after later commits."""
    from ..plans.merge import read_snapshot

    path = _merged_docs_table(spark, sf_dir)
    return _per_source_audit(read_snapshot(spark, path, version=1))


@register(
    "documents_merge_changes",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text, lang, source,
         length('v2:' || substr(text, 1, 40)) AS n_chars
  FROM documents WHERE doc_id % 10 = 3),
ins AS (
  SELECT d.doc_id + mx.m + 1 AS doc_id,
         'synthetic insert ' || (d.doc_id + mx.m + 1) AS text,
         'xx' AS lang, 'cdc' AS source,
         length('synthetic insert ' || (d.doc_id + mx.m + 1)) AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11),
merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins),
diff AS (
  SELECT d.doc_id AS o_id, d.text AS o_text, d.lang AS o_lang,
         d.source AS o_source, d.n_chars AS o_n,
         m.doc_id AS n_id, m.text AS n_text, m.lang AS n_lang,
         m.source AS n_source, m.n_chars AS n_n
  FROM documents d FULL OUTER JOIN merged m ON d.doc_id = m.doc_id),
changed AS (
  SELECT * FROM diff
  WHERE o_id IS NOT NULL AND n_id IS NOT NULL AND
        (o_text IS DISTINCT FROM n_text OR o_lang IS DISTINCT FROM n_lang
         OR o_source IS DISTINCT FROM n_source OR o_n IS DISTINCT FROM n_n)),
changes AS (
  SELECT 'insert' AS _change_type, n_id AS doc_id, n_source AS source,
         n_n AS n_chars
  FROM diff WHERE o_id IS NULL
  UNION ALL
  SELECT 'delete', o_id, o_source, o_n FROM diff WHERE n_id IS NULL
  UNION ALL
  SELECT 'update_preimage', o_id, o_source, o_n FROM changed
  UNION ALL
  SELECT 'update_postimage', n_id, n_source, n_n FROM changed)
SELECT _change_type, source, count(*)::BIGINT AS n_rows,
       sum(doc_id * 1009 + n_chars)::BIGINT AS checksum
FROM changes GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_documents_merge_changes(spark, sf_dir):
    """Change data feed (plans/merge.read_changes): net v1->v2 row diff of
    the CDC-merged table, audited per change type and source. The oracle
    re-derives the same diff declaratively (FULL OUTER JOIN + IS DISTINCT
    FROM), so a hash match proves the manifest-pruned CDF emits exactly
    the changed rows — carried-over rows in rewritten buckets excluded."""
    from ..plans.merge import read_changes

    path = _merged_docs_table(spark, sf_dir)
    return (
        read_changes(spark, path, 1, 2)
        .groupBy("_change_type", "source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("doc_id") * 1009 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
        )
        .orderBy("_change_type", "source")
    )


@register(
    "documents_cdf_view",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text, lang, source,
         length('v2:' || substr(text, 1, 40)) AS n_chars
  FROM documents WHERE doc_id % 10 = 3),
ins AS (
  SELECT d.doc_id + mx.m + 1 AS doc_id,
         'synthetic insert ' || (d.doc_id + mx.m + 1) AS text,
         'xx' AS lang, 'cdc' AS source,
         length('synthetic insert ' || (d.doc_id + mx.m + 1)) AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11),
merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins)
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars
FROM merged GROUP BY lang ORDER BY lang""",
)
def q_documents_cdf_view(spark, sf_dir):
    """Downstream view maintained from the change feed
    (plans/changefeed): bootstrapped over snapshot v1, then advanced to
    v2 by folding read_changes(1, 2) into the IVM state with signed
    weights. The oracle is the flat declarative GROUP BY over the merged
    corpus, so a hash match proves bootstrap + feed == batch recompute —
    the O(changes) downstream a 100 TB pipeline requires."""
    from ..plans.changefeed import create_view_over_table, sync_view
    from ..plans.merge import current_version

    src_path = _merged_docs_table(spark, sf_dir)
    keys = ["lang"]
    measures = [("n_docs", "count", None), ("sum_chars", "sum", "n_chars")]
    view = _scratch_path(sf_dir, "cdf_view", tables=("documents",))
    try:
        cv = current_version(view)
    except (OSError, ValueError):
        cv = 0
    if cv == 0:
        create_view_over_table(
            spark, src_path, view, keys, measures, at_version=1, n_buckets=8
        )
    sync_view(spark, src_path, view, keys, measures)
    from ..plans.ivm import ivm_read

    return (
        ivm_read(spark, view)
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sum_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Clustered compaction under the gate: build the events snapshot table,
# OPTIMIZE it by ts (within-bucket sort + MICROS stats), then answer a
# narrow time-range aggregate FROM THE OPTIMIZED TABLE. The oracle is
# the flat declarative filter over raw events — a hash match proves the
# clustered rewrite is lossless while the probe (WAREHOUSE_SCALE) shows
# the row-group skipping it buys.


def _optimized_events_table(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.merge import (
        create_merge_table,
        optimize_table,
        read_manifest,
    )

    path = _scratch_path(sf_dir, "opt_events", tables=("events",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if read_manifest(path).get("clustered"):
                return path
        except (OSError, ValueError):
            pass
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    create_merge_table(ev, path, "event_id", n_buckets=8)
    optimize_table(spark, path, ["ts"], max_records_per_file=100_000)
    return path


@register(
    "events_optimized_range_read",
    """WITH lo AS (SELECT min(ts) AS t FROM events)
SELECT event_type, count(*)::BIGINT AS cnt,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value
FROM events, lo
WHERE ts >= lo.t AND ts < lo.t + INTERVAL 12 HOUR
GROUP BY event_type ORDER BY event_type""",
)
def q_events_optimized_range_read(spark, sf_dir):
    from ..plans.merge import read_snapshot

    path = _optimized_events_table(spark, sf_dir)
    snap = read_snapshot(spark, path)
    lo = snap.agg(F.min("ts")).first()[0]
    return (
        snap.filter(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(lo) + F.expr("INTERVAL 12 HOURS"))
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (
                F.round(
                    F.sum(F.col("value").cast(DEC6)).cast("double"), 6
                )
                + F.lit(0.0)
            ).alias("sum_value"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Point reads under the gate: key_lookup against the CDC-merged table at
# BOTH the current version and v1 for a deterministic id set that spans
# every merge outcome — an updated id, a deleted id (present at v1 only),
# an untouched id, and a CDC-inserted id (present at v2 only). The plan
# is a union of single-bucket-directory scans; the oracle re-derives the
# same rows declaratively.


@register(
    "documents_point_reads",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text, lang, source,
         length('v2:' || substr(text, 1, 40)) AS n_chars
  FROM documents WHERE doc_id % 10 = 3),
ins AS (
  SELECT d.doc_id + mx.m + 1 AS doc_id,
         'synthetic insert ' || (d.doc_id + mx.m + 1) AS text,
         'xx' AS lang, 'cdc' AS source,
         length('synthetic insert ' || (d.doc_id + mx.m + 1)) AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11),
merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins),
ids AS (SELECT unnest([3, 7, 8, 13, (SELECT 11 + m + 1 FROM mx)]) AS id)
SELECT 'v2' AS at_version, doc_id, source, n_chars
FROM merged JOIN ids ON doc_id = id
UNION ALL
SELECT 'v1', doc_id, source, n_chars
FROM documents JOIN ids ON doc_id = id
ORDER BY at_version, doc_id""",
)
def q_documents_point_reads(spark, sf_dir):
    from ..plans.merge import key_lookup

    path = _merged_docs_table(spark, sf_dir)
    max_id = load(spark, sf_dir, "documents").agg(F.max("doc_id")).first()[0]
    ids = [3, 7, 8, 13, 11 + max_id + 1]
    parts = []
    for tag, version in (("v2", None), ("v1", 1)):
        for i in ids:
            parts.append(
                key_lookup(spark, path, i, version=version).select(
                    F.lit(tag).alias("at_version"),
                    "doc_id",
                    "source",
                    "n_chars",
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("at_version", "doc_id")


# ---------------------------------------------------------------------------
# Theta-sketch audience algebra: per-event-type distinct-user sketches
# maintained by the same out-of-order IVM fold, then SET OPERATIONS over
# the folded state at read time — union with, intersection with, and
# difference against the 'purchase' audience, the queries an audience
# platform answers from sketches without rescanning raw events. The
# user space is bucketed mod 4001 (< the theta sketch's 4096 nominal
# entries), so every estimate is EXACT and the DuckDB oracle can pair
# it declaratively (count(DISTINCT ...) with EXCEPT/INTERSECT logic).


_THETA_KEYS = ["event_type"]
_THETA_MEASURES = [
    ("cnt", "count", None),
    ("aud", "theta", "ub"),
]


def _theta_table(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.ivm import ivm_apply, ivm_create
    from ..plans.merge import current_version

    path = _scratch_path(sf_dir, "theta_audience", tables=("events",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if current_version(path) >= 4:
                return path
        except (OSError, ValueError):
            pass
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events")

    def delta(part):
        return ev.filter(F.pmod("event_id", F.lit(3)) == part).withColumn(
            "ub", F.pmod("user_id", F.lit(4001))
        )

    ivm_create(spark, path, delta(0), _THETA_KEYS, _THETA_MEASURES, n_buckets=4)
    for part in (2, 1, 0):
        ivm_apply(spark, path, delta(part), _THETA_KEYS, _THETA_MEASURES)
    return path


@register(
    "events_theta_audience",
    """WITH base AS (
  SELECT event_type, user_id % 4001 AS ub FROM events),
purch AS (SELECT DISTINCT ub FROM base WHERE event_type = 'purchase')
SELECT b.event_type,
       count(DISTINCT b.ub)::BIGINT AS aud,
       count(DISTINCT CASE WHEN p.ub IS NOT NULL THEN b.ub END)::BIGINT
         AS aud_and_purchase,
       count(DISTINCT CASE WHEN p.ub IS NULL THEN b.ub END)::BIGINT
         AS aud_not_purchase
FROM base b LEFT JOIN purch p ON b.ub = p.ub
GROUP BY b.event_type ORDER BY b.event_type""",
)
def q_events_theta_audience(spark, sf_dir):
    from ..plans.ivm import ivm_read

    path = _theta_table(spark, sf_dir)
    view = ivm_read(spark, path)
    purch = view.filter(F.col("event_type") == "purchase").select(
        F.lit(1).alias("_j"), F.col("aud").alias("paud")
    )
    # LEFT join on a constant, not a crossJoin: with no purchase events
    # the reference audience is the EMPTY set (intersection 0,
    # difference = the audience itself) — the oracle's LEFT JOIN shape
    return (
        view.withColumn("_j", F.lit(1))
        .join(F.broadcast(purch), "_j", "left")
        .select(
            "event_type",
            F.theta_sketch_estimate("aud").cast("long").alias("aud"),
            F.when(F.col("paud").isNull(), F.lit(0))
            .otherwise(
                F.theta_sketch_estimate(F.theta_intersection("aud", "paud"))
            )
            .cast("long")
            .alias("aud_and_purchase"),
            F.when(
                F.col("paud").isNull(), F.theta_sketch_estimate("aud")
            )
            .otherwise(
                F.theta_sketch_estimate(F.theta_difference("aud", "paud"))
            )
            .cast("long")
            .alias("aud_not_purchase"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Secondary index: the changefeed-maintained non-key lookup path. The
# index (plans/secondary: an IVM view keyed by lang whose hist map holds
# doc_ids) bootstraps at source v1 and advances to v2 by SYNC — so the
# lane proves incremental maintenance, not just the bootstrap: 'xx' docs
# exist only post-merge (the CDC inserts) and must be found, and the
# deleted/updated docs must have left their langs' maps. The lookups
# themselves are two point reads; the oracle is the flat declarative
# filter over the merged corpus.


def _sec_index_path(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import shutil

    from ..plans.changefeed import _cursor_state
    from ..plans.secondary import (
        create_secondary_index,
        sync_secondary_index,
    )

    from ..plans.changefeed import load_view_spec

    src = _merged_docs_table(spark, sf_dir)
    idx = _scratch_path(sf_dir, "sec_idx_lang", tables=("documents",))
    try:
        cursor, _pending = _cursor_state(idx)
        if "secondary" not in load_view_spec(idx):
            cursor = None  # pre-round-11 unsharded layout: rebuild
    except (OSError, ValueError):
        cursor = None
    if cursor is None or cursor < 2:
        shutil.rmtree(idx, ignore_errors=True)
        create_secondary_index(
            spark, src, idx, "lang", n_buckets=8, at_version=1
        )
        sync_secondary_index(spark, idx)
    return idx, src


@register(
    "documents_secondary_lookup",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text, lang, source,
         length('v2:' || substr(text, 1, 40)) AS n_chars
  FROM documents WHERE doc_id % 10 = 3),
ins AS (
  SELECT d.doc_id + mx.m + 1 AS doc_id,
         'synthetic insert ' || (d.doc_id + mx.m + 1) AS text,
         'xx' AS lang, 'cdc' AS source,
         length('synthetic insert ' || (d.doc_id + mx.m + 1)) AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11),
merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(doc_id * 1009 + n_chars)::BIGINT AS checksum
FROM merged WHERE lang IN ('xx', 'en')
GROUP BY lang ORDER BY lang""",
)
def q_documents_secondary_lookup(spark, sf_dir):
    from ..plans.secondary import lookup_by

    idx, src = _sec_index_path(spark, sf_dir)
    hits = lookup_by(spark, idx, "xx", source_table=src).unionByName(
        lookup_by(spark, idx, "en", source_table=src)
    )
    return (
        hits.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("doc_id") * 1009 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Secondary-index RANGE lookup (round 11): an index on n_chars answers a
# band predicate via one tiny index scan + a bucket-pruned source read —
# never a source scan. The index bootstraps at v1 and SYNCS across the
# CDC merge, so the lane also proves range answers reflect incremental
# maintenance (updated docs moved to their new n_chars entries, deleted
# docs gone, CDC inserts found). Oracle: flat declarative BETWEEN over
# the merged corpus.


def _sec_range_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import shutil

    from ..plans.changefeed import _cursor_state, load_view_spec
    from ..plans.secondary import (
        create_secondary_index,
        sync_secondary_index,
    )

    src = _merged_docs_table(spark, sf_dir)
    idx = _scratch_path(sf_dir, "sec_idx_nchars", tables=("documents",))
    try:
        cursor, _pending = _cursor_state(idx)
        if "secondary" not in load_view_spec(idx):
            cursor = None
    except (OSError, ValueError):
        cursor = None
    if cursor is None or cursor < 2:
        shutil.rmtree(idx, ignore_errors=True)
        create_secondary_index(
            spark, src, idx, "n_chars", n_buckets=8, at_version=1
        )
        sync_secondary_index(spark, idx)
    return idx, src


@register(
    "documents_secondary_range",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
upd AS (
  SELECT doc_id, 'v2:' || substr(text, 1, 40) AS text, lang, source,
         length('v2:' || substr(text, 1, 40)) AS n_chars
  FROM documents WHERE doc_id % 10 = 3),
ins AS (
  SELECT d.doc_id + mx.m + 1 AS doc_id,
         'synthetic insert ' || (d.doc_id + mx.m + 1) AS text,
         'xx' AS lang, 'cdc' AS source,
         length('synthetic insert ' || (d.doc_id + mx.m + 1)) AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11),
merged AS (
  SELECT doc_id, text, lang, source, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
  UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(doc_id * 1009 + n_chars)::BIGINT AS checksum,
       min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars
FROM merged WHERE n_chars BETWEEN 20 AND 60
GROUP BY lang ORDER BY lang""",
)
def q_documents_secondary_range(spark, sf_dir):
    from ..plans.secondary import range_lookup

    idx, src = _sec_range_index(spark, sf_dir)
    hits = range_lookup(spark, idx, 20, 60, source_table=src)
    return (
        hits.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("doc_id") * 1009 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Metadata-only schema evolution beyond ADD (round 11): rename + drop via
# the manifest schema log — zero data rewritten — then a schema-evolving
# merge that RE-ADDS the dropped name. Old dirs must read the renamed
# column under its new name, NULL for the re-added lineage, and the
# updated rows their new values. Oracle: the flat declarative derivation
# over raw documents. A hash match proves the whole log machinery
# (read_snapshot per-dir adaptation, merge against the evolved schema).


def _schema_evo_table(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.merge import (
        create_merge_table,
        current_version,
        drop_column,
        merge_into,
        rename_column,
    )

    path = _scratch_path(sf_dir, "schema_evo", tables=("documents",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if current_version(path) >= 4:
                return path
        except (OSError, ValueError):
            pass
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    docs = load(spark, sf_dir, "documents")
    create_merge_table(docs, path, "doc_id", n_buckets=8)     # v1
    rename_column(path, "n_chars", "char_count")              # v2
    drop_column(path, "source")                               # v3
    new_text = F.concat(F.lit("v2:"), F.substring("text", 1, 40))
    batch = (
        docs.filter(F.col("doc_id") % 10 == 3)
        .select(
            "doc_id",
            new_text.alias("text"),
            "lang",
            F.length(new_text).cast("long").alias("char_count"),
            F.lit("cdc-upd").alias("source"),  # re-adds the dropped name
            F.lit(False).alias("is_delete"),
        )
    )
    merge_into(
        spark, path, batch, delete_col="is_delete", schema_evolution=True
    )                                                          # v4
    return path


@register(
    "documents_schema_evolution",
    """WITH merged AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % 10 = 3
              THEN length('v2:' || substr(text, 1, 40)) ELSE n_chars END
           AS char_count,
         CASE WHEN doc_id % 10 = 3 THEN 'cdc-upd' END AS source
  FROM documents)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(char_count)::BIGINT AS sum_chars,
       count(source)::BIGINT AS n_readded,
       sum(doc_id * 1009 + char_count)::BIGINT AS checksum
FROM merged GROUP BY lang ORDER BY lang""",
)
def q_documents_schema_evolution(spark, sf_dir):
    from ..plans.merge import read_snapshot

    path = _schema_evo_table(spark, sf_dir)
    snap = read_snapshot(spark, path)
    return (
        snap.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("char_count").cast("long").alias("sum_chars"),
            F.count("source").cast("long").alias("n_readded"),
            F.sum(F.col("doc_id") * 1009 + F.col("char_count"))
            .cast("long")
            .alias("checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# SCD2 history: collapse each user's event stream into runs of identical
# event_type with [valid_from, valid_to) intervals — the slowly-changing-
# dimension build, as gaps-and-islands over one window pass + one
# aggregate. Scale: both windows partition by user_id (hash-parallel, no
# global sort); the aggregate is the same shuffle key.


@register(
    "events_scd2_history",
    """WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events),
segd AS (
  SELECT user_id, ts, event_type,
         sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS seg
  FROM seq),
grp AS (
  SELECT user_id, seg, event_type, min(ts) AS valid_from,
         count(*)::BIGINT AS n_events
  FROM segd GROUP BY user_id, seg, event_type)
SELECT user_id, seg::BIGINT AS seg, event_type, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to,
       n_events,
       (lead(valid_from) OVER (PARTITION BY user_id ORDER BY seg) IS NULL)
         AS is_current
FROM grp ORDER BY user_id, seg""",
)
def q_events_scd2_history(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chg = (
        F.lag("event_type").over(w).isNull()
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("int")
    segd = ev.withColumn(
        "seg",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    grp = segd.groupBy("user_id", "seg", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("seg")
    return (
        grp.select(
            "user_id",
            F.col("seg").cast("long").alias("seg"),
            "event_type",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
            "n_events",
            F.lead("valid_from").over(w2).isNull().alias("is_current"),
        )
        .orderBy("user_id", "seg")
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: the hourly rollup maintained by folding
# three OUT-OF-ORDER delta batches (split by event_id hash, not time)
# into the snapshot-versioned state table — then read back. The oracle is
# the flat declarative GROUP BY, so a hash match proves
# apply∘apply∘apply == batch recompute. Sums ride DECIMAL(18,6): exact
# decimal addition is order-independent, so the incremental fold cannot
# drift from the flat sum by float re-association.


def _ivm_keys_measures():
    keys = ["hour", "event_type"]
    measures = [("cnt", "count", None), ("sum_dec", "sum", "value_dec")]
    return keys, measures


def _ivm_delta(ev, part: int):
    return (
        ev.filter(F.pmod("event_id", F.lit(3)) == part)
        .withColumn("hour", F.date_trunc("hour", "ts"))
        .withColumn("value_dec", F.col("value").cast(DEC6))
    )


def _ivm_hourly_table(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.ivm import ivm_apply, ivm_create
    from ..plans.merge import current_version

    path = _scratch_path(sf_dir, "ivm_hourly", tables=("events",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if current_version(path) >= 4:
                return path
        except (OSError, ValueError):
            pass
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events")
    keys, measures = _ivm_keys_measures()
    ivm_create(spark, path, _ivm_delta(ev, 0), keys, measures, n_buckets=8)
    for part in (2, 0, 1):  # deliberately out of order
        ivm_apply(spark, path, _ivm_delta(ev, part), keys, measures)
    return path


# ---------------------------------------------------------------------------
# Sketch-measure IVM: the same out-of-order fold, but the state carries
# the full mergeable-measure family — min/max (commutative monoids), an
# HLL distinct sketch (Datasketches, merged with hll_union), and a
# Misra–Gries heavy-hitters map. The oracle pairing is EXACT by
# construction: user_id % 257 keeps every group inside the HLL coupon
# range where the estimate is the true count (empirically exact through
# 512 distinct, first drift at 768), and K=40 ≥ 31 possible
# day-of-month values makes the MG summary the exact per-value counts
# (compress threshold 0). So a hash match proves the sketch folds —
# not just the additive ones — converge to the declarative answer.


def _ivm_sketch_delta(ev, part: int):
    return (
        ev.filter(F.pmod("event_id", F.lit(3)) == part)
        .withColumn("value_dec", F.col("value").cast(DEC6))
        .withColumn("ubucket", F.pmod("user_id", F.lit(257)))
        .withColumn("dom", F.dayofmonth("ts").cast("string"))
        .withColumn(
            "vbin",
            F.least(F.floor(F.col("value") / 50), F.lit(9)).cast("string"),
        )
    )


_SKETCH_KEYS = ["event_type"]
_SKETCH_MEASURES = [
    ("cnt", "count", None),
    ("vmin", "min", "value_dec"),
    ("vmax", "max", "value_dec"),
    ("ndv_sk", "approx_ndv", "ubucket"),
    ("hot", "approx_topk:40", "dom"),
    ("vhist", "hist", "vbin"),
]


def _ivm_sketch_table(spark: SparkSession, sf_dir: str) -> str:
    from ..plans.ivm import ivm_apply, ivm_create
    from ..plans.merge import current_version

    path = _scratch_path(sf_dir, "ivm_sketches_v2", tables=("events",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if current_version(path) >= 4:
                return path
        except (OSError, ValueError):
            pass
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    ev = load(spark, sf_dir, "events")
    ivm_create(
        spark, path, _ivm_sketch_delta(ev, 0), _SKETCH_KEYS,
        _SKETCH_MEASURES, n_buckets=8,
    )
    for part in (1, 2, 0):  # deliberately out of order
        ivm_apply(
            spark, path, _ivm_sketch_delta(ev, part), _SKETCH_KEYS,
            _SKETCH_MEASURES,
        )
    return path


@register(
    "events_ivm_sketches",
    """WITH base AS (
  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS vdec,
         user_id % 257 AS ub, CAST(day(ts) AS VARCHAR) AS dom,
         CAST(CAST(least(floor(value / 50), 9) AS BIGINT) AS VARCHAR) AS vbin
  FROM events),
hot AS (
  SELECT event_type, dom, count(*)::BIGINT AS c
  FROM base WHERE dom IS NOT NULL GROUP BY 1, 2),
hots AS (
  SELECT event_type,
         string_agg(dom || ':' || c, ',' ORDER BY c DESC, dom) AS hot_days
  FROM hot GROUP BY 1),
hb AS (
  SELECT event_type, vbin, count(*)::BIGINT AS c
  FROM base WHERE vbin IS NOT NULL GROUP BY 1, 2),
hbs AS (
  SELECT event_type,
         string_agg(vbin || ':' || c, ',' ORDER BY vbin) AS value_hist
  FROM hb GROUP BY 1)
SELECT b.event_type, count(*)::BIGINT AS cnt,
       round(CAST(min(b.vdec) AS DOUBLE), 6) AS vmin,
       round(CAST(max(b.vdec) AS DOUBLE), 6) AS vmax,
       count(DISTINCT b.ub)::BIGINT AS ndv_users,
       min(h.hot_days) AS hot_days,
       min(v.value_hist) AS value_hist
FROM base b JOIN hots h USING (event_type) JOIN hbs v USING (event_type)
GROUP BY b.event_type ORDER BY b.event_type""",
)
def q_events_ivm_sketches(spark, sf_dir):
    from ..plans.ivm import ivm_read

    path = _ivm_sketch_table(spark, sf_dir)
    ents = F.array_sort(
        F.map_entries("hot"),
        lambda a, b: F.when(a["value"] > b["value"], F.lit(-1))
        .when(a["value"] < b["value"], F.lit(1))
        .when(a["key"] < b["key"], F.lit(-1))
        .when(a["key"] > b["key"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    hot_str = F.array_join(
        F.transform(
            ents,
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
        ",",
    )
    hist_str = F.array_join(
        F.transform(
            F.array_sort(F.map_entries("vhist")),  # struct sort: key asc
            lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
        ),
        ",",
    )
    return (
        ivm_read(spark, path)
        .select(
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            (F.round(F.col("vmin").cast("double"), 6) + F.lit(0.0)).alias(
                "vmin"
            ),
            (F.round(F.col("vmax").cast("double"), 6) + F.lit(0.0)).alias(
                "vmax"
            ),
            F.hll_sketch_estimate("ndv_sk").alias("ndv_users"),
            hot_str.alias("hot_days"),
            hist_str.alias("value_hist"),
        )
        .orderBy("event_type")
    )


@register(
    "events_ivm_hourly",
    """SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*)::BIGINT AS cnt,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
         AS sum_value,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS avg_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
)
def q_events_ivm_hourly(spark, sf_dir):
    from ..plans.ivm import ivm_read

    path = _ivm_hourly_table(spark, sf_dir)
    return (
        ivm_read(spark, path)
        .select(
            "hour",
            "event_type",
            F.col("cnt").cast("long").alias("cnt"),
            (F.round(F.col("sum_dec").cast("double"), 6) + F.lit(0.0)).alias(
                "sum_value"
            ),
            (
                F.round(
                    F.col("sum_dec").cast("double") / F.col("cnt"), 6
                )
                + F.lit(0.0)
            ).alias("avg_value"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# Atomic multi-table commit (round 12, plans/txn): a source merge and its
# secondary-index sync advance as ONE transaction. The lane first runs an
# ABORTED transaction (a poison batch that would corrupt both checksums,
# rolled back by the block exception — nothing of it may be visible),
# then the committed CDC transaction, then answers through the INDEX with
# the in-plan freshness check live. Oracle: the flat declarative merged
# state — a hash match proves the aborted txn left zero trace and the
# committed txn advanced source + index consistently.


def _txn_docs_table(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import shutil

    from ..plans.changefeed import _cursor_state, load_view_spec
    from ..plans.merge import create_merge_table, merge_into
    from ..plans.secondary import (
        create_secondary_index,
        sync_secondary_index,
    )
    from ..plans.txn import transaction

    src = _scratch_path(sf_dir, "txn_docs", tables=("documents",))
    idx = _scratch_path(sf_dir, "txn_docs_idx", tables=("documents",))
    log = _scratch_path(sf_dir, "txn_docs_log", tables=("documents",))
    try:
        cursor, _pending = _cursor_state(idx)
        if "secondary" not in load_view_spec(idx):
            cursor = None
    except (OSError, ValueError):
        cursor = None
    if cursor is not None and cursor >= 2:
        return idx, src
    for p in (src, idx, log):
        shutil.rmtree(p, ignore_errors=True)
    base = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    create_merge_table(base, src, "doc_id", n_buckets=8)
    create_secondary_index(spark, src, idx, "lang", n_buckets=8)
    max_id = base.agg(F.max("doc_id")).first()[0]

    # aborted transaction: would poison BOTH output groups (xx rows with
    # +999999 char counts); the block exception must roll it back whole
    poison = base.filter(F.col("doc_id") % 10 == 4).select(
        "doc_id", F.lit("xx").alias("lang"),
        (F.col("n_chars") + 999999).alias("n_chars"),
        F.lit(False).alias("is_delete"),
    )
    try:
        with transaction(log):
            merge_into(spark, src, poison, delete_col="is_delete")
            sync_secondary_index(spark, idx)
            raise RuntimeError("injected abort")
    except RuntimeError:
        pass

    # committed transaction: updates / deletes / inserts + index sync
    upd = base.filter(F.col("doc_id") % 10 == 3).select(
        "doc_id", F.lit("xx").alias("lang"),
        (F.col("n_chars") + 1000).alias("n_chars"),
        F.lit(False).alias("is_delete"),
    )
    dels = base.filter(
        (F.col("doc_id") % 13 == 7) & (F.col("doc_id") % 10 != 3)
    ).select(
        "doc_id", "lang", "n_chars", F.lit(True).alias("is_delete")
    )
    ins = base.filter(F.col("doc_id") % 29 == 11).select(
        (F.col("doc_id") + F.lit(max_id + 1)).alias("doc_id"),
        F.lit("xx").alias("lang"),
        (F.col("n_chars") + 7).alias("n_chars"),
        F.lit(False).alias("is_delete"),
    )
    with transaction(log):
        merge_into(
            spark, src, upd.unionByName(dels).unionByName(ins),
            delete_col="is_delete", batch_key="txn_docs:cdc",
        )
        sync_secondary_index(spark, idx)
    return idx, src


@register(
    "documents_txn_ingest",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
merged AS (
  SELECT doc_id, lang, n_chars FROM documents
  WHERE doc_id % 10 <> 3 AND doc_id % 13 <> 7
  UNION ALL
  SELECT doc_id, 'xx' AS lang, n_chars + 1000 AS n_chars
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT d.doc_id + mx.m + 1 AS doc_id, 'xx' AS lang,
         d.n_chars + 7 AS n_chars
  FROM documents d, mx WHERE d.doc_id % 29 = 11
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(doc_id * 1009 + n_chars)::BIGINT AS checksum
FROM merged WHERE lang IN ('xx', 'en')
GROUP BY lang ORDER BY lang""",
)
def q_documents_txn_ingest(spark, sf_dir):
    from ..plans.secondary import lookup_by

    idx, src = _txn_docs_table(spark, sf_dir)
    hits = lookup_by(spark, idx, "xx", source_table=src).unionByName(
        lookup_by(spark, idx, "en", source_table=src)
    )
    return (
        hits.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("doc_id") * 1009 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Maintenance round-trip (round 12, plans/maintain): three scattering
# merges, then ONE table_maintain pass (heal -> recover -> compact ->
# vacuum, grace 0) — and the audit must hash-match the flat declarative
# derivation, proving compaction rewrote in-place-equivalent bytes and
# vacuum retired only dead history. The manifest must show the compacted
# single-dir layout (checked in the builder, not the output).


def _maintained_docs_table(spark: SparkSession, sf_dir: str) -> str:
    import shutil

    from ..plans.maintain import table_maintain
    from ..plans.merge import (
        create_merge_table,
        current_version,
        merge_into,
        read_manifest,
    )

    path = _scratch_path(sf_dir, "maint_docs", tables=("documents",))
    done = os.path.join(path, "_snapshots", "CURRENT")
    if os.path.isfile(done):
        try:
            if current_version(path) >= 5:
                return path
        except (OSError, ValueError):
            pass
    shutil.rmtree(path, ignore_errors=True)
    base = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    create_merge_table(base, path, "doc_id", n_buckets=8)
    max_id = base.agg(F.max("doc_id")).first()[0]
    # three NARROW merges (single-row deltas) so the live snapshot
    # scatters across data dirs — the shape a long CDC history leaves
    m1 = base.filter(F.col("doc_id") == 15).select(
        "doc_id", "lang", (F.col("n_chars") + 100).alias("n_chars"),
        F.lit(False).alias("is_delete"),
    )
    m2 = base.filter(F.col("doc_id") == 22).select(
        "doc_id", "lang", "n_chars", F.lit(True).alias("is_delete")
    )
    m3 = spark.createDataFrame(
        [(int(max_id) + 1, "mm", 77, False)],
        "doc_id bigint, lang string, n_chars bigint, is_delete boolean",
    )
    for m in (m1, m2, m3):
        merge_into(spark, path, m, delete_col="is_delete")
    report = table_maintain(spark, path, vacuum_grace_seconds=0.0)
    assert report["compacted_to"] == 5, report
    assert len(set(read_manifest(path)["buckets"].values())) == 1
    return path


@register(
    "documents_table_maintain",
    """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
merged AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id NOT IN (15, 22)
  UNION ALL
  SELECT doc_id, lang, n_chars + 100 AS n_chars
  FROM documents WHERE doc_id = 15
  UNION ALL
  SELECT mx.m + 1 AS doc_id, 'mm' AS lang, 77 AS n_chars FROM mx
)
SELECT lang, count(*)::BIGINT AS n_docs,
       sum(doc_id * 31 + n_chars)::BIGINT AS checksum,
       min(n_chars)::BIGINT AS min_chars
FROM merged GROUP BY lang ORDER BY lang""",
)
def q_documents_table_maintain(spark, sf_dir):
    from ..plans.merge import read_snapshot

    path = _maintained_docs_table(spark, sf_dir)
    return (
        read_snapshot(spark, path)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("doc_id") * 31 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
            F.min("n_chars").cast("long").alias("min_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# AS-OF secondary lookups as a driver-visible gate (round 12): the lane
# answers one value at CURRENT and a batch AS-OF the pre-merge version —
# through the index both times — and the union must hash-match the flat
# two-state derivation. Pins the cursor-matched time travel the pytest
# lanes already cover, but under the external oracle.


def _asof_docs_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import shutil

    from ..plans.changefeed import _cursor_state, load_view_spec
    from ..plans.merge import create_merge_table, merge_into
    from ..plans.secondary import (
        create_secondary_index,
        sync_secondary_index,
    )

    src = _scratch_path(sf_dir, "asof_docs", tables=("documents",))
    idx = _scratch_path(sf_dir, "asof_docs_idx", tables=("documents",))
    try:
        cursor, _pending = _cursor_state(idx)
        if "secondary" not in load_view_spec(idx):
            cursor = None
    except (OSError, ValueError):
        cursor = None
    if cursor is not None and cursor >= 2:
        return idx, src
    for p in (src, idx):
        shutil.rmtree(p, ignore_errors=True)
    base = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    create_merge_table(base, src, "doc_id", n_buckets=8)
    create_secondary_index(spark, src, idx, "lang", n_buckets=8)
    moved = base.filter(F.col("doc_id") % 9 == 5).select(
        "doc_id", F.lit("zz").alias("lang"), "n_chars",
        F.lit(False).alias("is_delete"),
    )
    merge_into(spark, src, moved, delete_col="is_delete")
    sync_secondary_index(spark, idx)
    return idx, src


@register(
    "documents_secondary_asof",
    """WITH v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 5 THEN 'zz' ELSE lang END AS lang,
         n_chars
  FROM documents
)
SELECT * FROM (
  SELECT 'asof_en' AS tag, count(*)::BIGINT AS n_docs,
         sum(doc_id * 17 + n_chars)::BIGINT AS checksum
  FROM documents WHERE lang = 'en'
  UNION ALL
  SELECT 'now_zz' AS tag, count(*)::BIGINT AS n_docs,
         sum(doc_id * 17 + n_chars)::BIGINT AS checksum
  FROM v2 WHERE lang = 'zz'
) ORDER BY tag""",
)
def q_documents_secondary_asof(spark, sf_dir):
    from ..plans.secondary import lookup_by, lookup_by_many

    idx, src = _asof_docs_index(spark, sf_dir)

    def audit(df, tag):
        return df.agg(
            F.lit(tag).alias("tag"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("doc_id") * 17 + F.col("n_chars"))
            .cast("long")
            .alias("checksum"),
        )

    now = audit(lookup_by(spark, idx, "zz", source_table=src), "now_zz")
    asof = audit(
        lookup_by_many(
            spark, idx, ["en"], at_source_version=1, source_table=src
        ),
        "asof_en",
    )
    return asof.unionByName(now).orderBy("tag")


# ---------------------------------------------------------------------------
# Engine-tier crash recovery (round 13, plans/engine_txn): the product
# ingest path (chunks table + FTS postings + ANN sidecar) records pending
# index work as a crash-durable intent BEFORE each mutation. This lane
# opens the classic crash window — per-file ingests and a delete with the
# amortized optimize() never reached — then "restarts" the engine and
# lets recover_indexes() converge. The builder asserts the recovery took
# the BOUNDED path (version chain proven, no full rebuild) and that the
# recovered postings are row-identical to a from-scratch rebuild; the
# driver-visible result audits the final corpus membership against the
# flat declarative derivation.


def _recovered_engine_table(spark: SparkSession, sf_dir: str) -> str:
    path = _scratch_path(sf_dir, "idxrec", tables=("documents",))
    table = os.path.join(path, "chunks")
    done = os.path.join(path, "_done.json")
    if os.path.isfile(done):
        return table
    # two sweeps (full + vanilla twin) can hit the same sf scratch
    # concurrently: the build runs under a flock, the loser re-checks the
    # done marker instead of rmtree-ing the winner's files mid-read
    from ..plans.locks import flock_dir

    os.makedirs(path, exist_ok=True)
    with flock_dir(path, "._build.lock", create=True):
        return _build_recovered_engine_table(spark, sf_dir, path, table, done)


def _build_recovered_engine_table(
    spark: SparkSession, sf_dir: str, path: str, table: str, done: str
) -> str:
    import json
    import shutil

    from ..engine import RagEngine
    from ..plans.engine_txn import read_intent

    if os.path.isfile(done):
        return table  # built while we waited on the lock
    for sub in ("files", "chunks", "chunks_fts", "chunks_ann", "ref_fts"):
        shutil.rmtree(os.path.join(path, sub), ignore_errors=True)
    files = os.path.join(path, "files")
    os.makedirs(files)
    ids = sorted(
        int(r["doc_id"])
        for r in load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 60) & (F.col("doc_id") % 7 == 3))
        .select("doc_id")
        .collect()
    )

    def fpath(i: int) -> str:
        return os.path.join(files, f"d{i}.md")

    def write_doc(i: int) -> None:
        with open(fpath(i), "w") as f:
            f.write(
                f"# Doc {i}\n\nrecovery corpus uniq{i}tok document body with "
                "deterministic filler words for the chunker minimum."
            )

    # phase 1: a clean, optimized baseline over the odd ids
    for i in ids:
        if i % 2 == 1:
            write_doc(i)
    eng = RagEngine(spark, table)
    eng.ingest_directory(files)
    assert eng.index_is_fresh() and read_intent(table) is None

    # phase 2: the crash window — even-id ingests and one delete land in
    # the table and the intent, but the amortized optimize() never runs
    for i in ids:
        if i % 2 == 0:
            write_doc(i)
            eng.ingest_file(fpath(i))
    deleted = ids[0]  # doc_id 3: odd, present since phase 1
    eng.delete_document(fpath(deleted))
    assert read_intent(table) is not None  # window open; process "dies"

    # phase 3: restart + automatic recovery
    eng2 = RagEngine(spark, table)
    assert not eng2._needs_full_index, "version chain must prove the intent"
    assert not eng2.index_is_fresh()
    assert eng2.recover_indexes()["fts"] is True
    assert eng2.index_is_fresh() and read_intent(table) is None
    # r16 (VERDICT item 4): the fixture used to RE-VERIFY here that the
    # recovered postings are row-identical to a from-scratch rebuild
    # (ref_fts write + two index reads + two keyword_search probes) —
    # ~50 of the build's 154 driver jobs spent duplicating coverage the
    # default suite already pins (tests/test_engine_recovery.py::
    # test_sync_crash_recovers_bounded and the mutation-storm fuzz both
    # assert recovered == rebuilt with the same ref-postings technique).
    # The driver-visible query still audits the final corpus membership
    # against the oracle; the invariant asserts above (bounded path,
    # intent cleared, index fresh) keep guarding fixture integrity.
    with open(done, "w") as f:
        json.dump({"ids": ids, "deleted": deleted}, f)
    return table


@register(
    "documents_index_recovery",
    """SELECT doc_id % 3 AS grp, count(*)::BIGINT AS n_files,
       sum(doc_id)::BIGINT AS sum_ids
FROM documents
WHERE doc_id < 60 AND doc_id % 7 = 3 AND doc_id <> 3
GROUP BY grp ORDER BY grp""",
)
def q_documents_index_recovery(spark, sf_dir):
    table = _recovered_engine_table(spark, sf_dir)
    dids = (
        read_parquet(spark, table)
        .select(
            F.regexp_extract("filePath", r"d(\d+)\.md$", 1)
            .cast("long")
            .alias("did")
        )
        .distinct()
    )
    return (
        dids.groupBy((F.col("did") % 3).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("did").cast("long").alias("sum_ids"),
        )
        .orderBy("grp")
    )
