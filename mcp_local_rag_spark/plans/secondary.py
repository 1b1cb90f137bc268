"""Secondary indexes on snapshot tables, maintained from the change feed.

A snapshot table (plans/merge) answers point reads on its PRIMARY key in
one bucket scan (key_lookup); any other predicate is a full scan. This
module adds the warehouse answer for selective non-key lookups — a
SECONDARY index that is itself just composition of existing primitives:

    index  =  changefeed view  KEYED BY (indexed columns..., pk_shard),
              measures = [count, hist(primary key)]

``pk_shard = pmod(xxhash64(pk), S)`` shards each indexed value's posting
map across S state rows — the salting trick operators/skew.py uses for
hot aggregation keys, applied to index state. Without it a
low-selectivity value ('en' on a 100 TB corpus) accretes ONE unbounded
map row that a lookup must pull to the driver; with it, per-row state is
|pks(value)| / S, and a skewed value's lookup never materializes its pk
set at all (see lookup_by's two plans below).

The ``hist`` map measure (plans/ivm) stores, per (value, shard), the set
of primary keys carrying that value (map pk -> row count). Because hist
is ADDITIVE AND INVERTIBLE, the change feed maintains it exactly: an
update that moves a row from value A to value B retracts the pk from A's
shard map (update_preimage, weight -1) and adds it to B's
(update_postimage, +1); a (value, shard) whose count empties leaves the
index (group removal). Sync cost is O(changes) — the changefeed
machinery — never O(table).

Lookups are bounded point reads with TWO plans, picked by the value's
selectivity (the count measure, read without touching the posting maps
— parquet column pruning keeps them unread):
  * SELECTIVE value (few pks): read the shard maps, route each pk to its
    source bucket driver-locally (functions/spark_hash), and read the
    source with a typed pk IN-list — row-group pruning inside the
    key-sorted bucket files.
  * SKEWED value (many pks): never collect the pks. S is a multiple of
    the source's bucket count, so the shards that HOLD postings name the
    source buckets that HOLD rows (pmod algebra: shard % n_buckets ==
    bucket). Read those buckets and filter by the indexed columns
    directly — a distributed plan whose driver state is ≤ S counters.

No counterpart in the reference (LanceDB tables are scan-or-ANN only,
src/vectordb/index.ts); modeled on Delta/Hudi secondary-index designs.

Scale posture: index size rides (distinct values x S); per-row state is
bounded by |pks| / S; lookup cost rides the value's selectivity, not the
table; driver memory is bounded by min(|pks|, inlist_cap) + S counters.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changefeed import (
    create_view_over_table,
    load_view_spec,
    sync_view,
)
from .ivm import ivm_key_of
from .merge import (
    _typed_key_pred,
    read_manifest,
    read_snapshot,
)

_PKS = "_pks"
_CNT = "_n"
_SHARD = "_pk_shard"
_KEY = "_ivm_key"

# above this many pks the lookup switches to the distributed plan (no
# driver-side pk materialization); below it, the typed IN-list plan wins
# via row-group pruning in the key-sorted source files
INLIST_CAP = 8192


def _shard_transform(pk: str, shards: int):
    def tf(df: DataFrame) -> DataFrame:
        return df.withColumn(
            _SHARD,
            F.pmod(F.xxhash64(F.col(pk).cast("string")), F.lit(shards))
            .cast("int"),
        )

    return tf


def create_secondary_index(
    spark: SparkSession,
    source_table: str,
    index_path: str,
    cols: str | list[str],
    *,
    n_buckets: int = 16,
    at_version: int | None = None,
    pk_shards: int | None = None,
) -> int:
    """Bootstrap the index over the source's snapshot (current, or
    ``at_version``); later ``sync_secondary_index`` calls ride the
    change feed. ``cols`` may be one column or a composite list. The
    source's primary-key column is read from its manifest.

    ``pk_shards`` defaults to the source's bucket count and is rounded
    UP to a multiple of it — that multiple is what lets the skewed-value
    plan map posting shards to source buckets without touching a pk."""
    import json
    import os

    cols = [cols] if isinstance(cols, str) else list(cols)
    src_manifest = read_manifest(source_table)
    pk = src_manifest["key"]
    src_nb = src_manifest["n_buckets"]
    shards = pk_shards or src_nb
    if shards % src_nb:
        shards = ((shards // src_nb) + 1) * src_nb
    v = create_view_over_table(
        spark,
        source_table,
        index_path,
        keys=[*cols, _SHARD],
        measures=[(_CNT, "count", None), (_PKS, "hist", pk)],
        n_buckets=n_buckets,
        at_version=at_version,
        transform=_shard_transform(pk, shards),
    )
    # the shard transform is reconstructible from (pk, shards) — record
    # the index's own spec flavor. transform stays TRUTHY ("secondary")
    # so the generic sync_view_auto refuses (it would sync without the
    # shard column); sync_secondary_index rebuilds the transform itself.
    spec = load_view_spec(index_path)
    spec["transform"] = "secondary"
    spec["secondary"] = {"pk": pk, "pk_shards": shards, "cols": cols}
    with open(os.path.join(index_path, "_view_spec.json"), "w") as f:
        json.dump(spec, f)
    return v


def _load_secondary_spec(index_path: str) -> dict:
    spec = load_view_spec(index_path)
    if "secondary" not in spec:
        raise ValueError(
            f"{index_path} is not a sharded secondary index (pre-round-11 "
            "layout?); rebuild it with create_secondary_index"
        )
    return spec


def sync_secondary_index(spark: SparkSession, index_path: str) -> int | None:
    """Advance the index to the source's current version (O(changes));
    the spec sidecar recorded at create time carries
    source/keys/measures/shards."""
    spec = _load_secondary_spec(index_path)
    sec = spec["secondary"]
    return sync_view(
        spark,
        spec["source_table"],
        index_path,
        spec["keys"],
        [tuple(m) for m in spec["measures"]],
        transform=_shard_transform(sec["pk"], sec["pk_shards"]),
    )


def _index_version_for_source(index_path: str, source_version: int) -> int:
    """The latest INDEX version whose cdf cursor fully reflects exactly
    ``source_version`` — the time-travel join point between the two
    tables' histories (metadata-only: walks the index's manifests)."""
    from .changefeed import _cursor_state
    from .merge import _current_raw, list_versions, read_manifest

    # versions <= the committed CURRENT are committed by the monotonic
    # flip invariant; anything above may be a PREPARED manifest of an
    # in-flight transaction (published, CURRENT not flipped) — resolving
    # to one would read uncommitted data that may later abort, so those
    # are skipped unless their txn record says commit. A manifest
    # unlinked by a concurrent abort mid-walk is tolerated and skipped.
    try:
        committed = _current_raw(index_path)
    except FileNotFoundError:
        committed = 0
    seen = []
    for iv in reversed(list_versions(index_path)):
        if iv > committed:
            try:
                txn_info = read_manifest(index_path, iv).get("txn")
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            if txn_info is not None:
                from .txn import resolve_txn

                if resolve_txn(txn_info, abort_inflight=False)["state"] != "commit":
                    continue
        try:
            cursor, pending = _cursor_state(index_path, iv)
        except FileNotFoundError:
            continue
        if cursor == source_version and pending is None:
            return iv
        seen.append((iv, cursor))
    raise ValueError(
        f"no index version reflects source version {source_version} "
        f"(index versions and cursors: {seen}); the index may have "
        "skipped it in one multi-version sync, or vacuum retired it"
    )


def _check_fresh(index_path: str, src: str) -> None:
    from .changefeed import _cursor_state
    from .merge import current_version

    cursor, _pending = _cursor_state(index_path)
    cur = current_version(src)
    if cursor is None or cursor < cur:
        raise ValueError(
            f"index {index_path} is stale (cursor {cursor} < source "
            f"version {cur}); run sync_secondary_index, or pass "
            "stale_ok=True to read the index as of its cursor"
        )


def _resolve_idx_version(
    index_path: str,
    src: str,
    stale_ok: bool,
    at_source_version: int | None,
) -> int:
    """The ONE index version a lookup reads end-to-end. AS-OF resolves
    through the recorded changefeed cursor; otherwise the current version
    is pinned UP FRONT so a sync commit landing mid-lookup can never make
    the plan-choosing counter read and the posting read disagree."""
    from .merge import current_version

    if at_source_version is not None:
        return _index_version_for_source(index_path, at_source_version)
    if not stale_ok:
        _check_fresh(index_path, src)
    return current_version(index_path)


def _vals_pred(df: DataFrame, cols: list[str], vals: tuple):
    """Typed equality over the indexed columns; None matches IS NULL
    (the null-safe key encoding keeps NULL-valued entries distinct)."""
    pred = F.lit(True)
    for c, v in zip(cols, vals):
        pred = pred & (
            F.col(c).isNull() if v is None else _typed_key_pred(df, c, [v])
        )
    return pred


def _read_index_rows(
    spark: SparkSession,
    index_path: str,
    spec: dict,
    vals: tuple,
    idx_version: int | None,
    columns: list[str],
) -> DataFrame:
    """Index rows for ONE value tuple, bucket-pruned by the value's S
    candidate state keys — all computed driver-locally when the value
    types mirror Spark's string cast, else pruned only by the equality
    filter (still a tiny table)."""
    from ..functions.spark_hash import bucket_of

    sec = spec["secondary"]
    cols = sec["cols"]
    idx_nb = read_manifest(index_path, idx_version)["n_buckets"]
    only, key_filter = None, None
    try:
        keys = [
            ivm_key_of([*vals, shard]) for shard in range(sec["pk_shards"])
        ]
        only = sorted({bucket_of(k, idx_nb) for k in keys})
        key_filter = F.col(_KEY).isin(keys)
    except TypeError:
        pass  # non-mirrorable value type: scan the (tiny) index
    idx = read_snapshot(spark, index_path, idx_version, only_buckets=only)
    pred = _vals_pred(idx, cols, vals)
    if key_filter is not None:
        pred = key_filter & pred
    return idx.filter(pred).select(*columns)


def _empty_like_source(
    spark: SparkSession, src: str, version: int | None
) -> DataFrame:
    snap_all = read_snapshot(spark, src, version)
    return snap_all.filter(F.lit(False)).drop("bucket")


def _source_read_for_postings(
    spark: SparkSession,
    src: str,
    src_version: int | None,
    shard_counts: list[tuple[int, int]],
    pk: str,
    shards: int,
    pks_df: DataFrame | None,
    inlist_cap: int,
    big_pred,
) -> DataFrame:
    """The source-side half of a lookup, given the (shard, count) rows
    already read from the index. Picks the IN-list or the distributed
    plan by total selectivity; driver state is bounded by
    min(total, inlist_cap) pks + S counters either way. ``big_pred``
    builds the distributed plan's filter (equality / IN / range over the
    indexed columns) against the narrowed source frame."""
    from ..functions.spark_hash import bucket_of

    total = sum(c for _, c in shard_counts)
    if total == 0:
        return _empty_like_source(spark, src, src_version)
    src_manifest = read_manifest(src, src_version)
    src_nb = src_manifest["n_buckets"]
    if total <= inlist_cap and pks_df is not None:
        # SELECTIVE: pull the pks (bounded by the cap), route each to
        # its bucket locally, push a typed IN-list to the scan
        pks = sorted(
            {
                p
                for r in pks_df.select(
                    F.map_keys(F.col(_PKS)).alias("ks")
                ).collect()
                for p in r["ks"]
            }
        )
        buckets = sorted({bucket_of(p, src_nb) for p in pks})
        narrowed = read_snapshot(
            spark, src, src_version, only_buckets=buckets
        )
        return narrowed.filter(_typed_key_pred(narrowed, pk, pks)).drop(
            "bucket"
        )
    # SKEWED: shards holding postings name the source buckets holding
    # rows (shards ≡ 0 mod src_nb by construction; a rebucket can break
    # that — then every bucket is read but the plan stays distributed)
    if shards % src_nb == 0:
        buckets = sorted({s % src_nb for s, c in shard_counts if c > 0})
    else:
        buckets = None
    narrowed = read_snapshot(spark, src, src_version, only_buckets=buckets)
    return narrowed.filter(big_pred(narrowed)).drop("bucket")


def lookup_by(
    spark: SparkSession,
    index_path: str,
    value,
    *,
    source_table: str | None = None,
    stale_ok: bool = False,
    at_source_version: int | None = None,
    inlist_cap: int = INLIST_CAP,
) -> DataFrame:
    """Rows of the SOURCE whose indexed column(s) equal ``value`` (a
    scalar, or a tuple for a composite index) — bounded point reads,
    never a source scan, never an unbounded driver materialization.
    Returns an empty frame (source schema) when the value is absent.

    Freshness contract: an index lagging the source would silently miss
    rows, so a lookup against a stale index RAISES unless the caller
    passes ``stale_ok=True`` (metadata-only check: the index's recorded
    cursor vs the source's CURRENT pointer).

    ``at_source_version``: AS-OF lookup — both sides time travel to the
    matching versions (the index version is resolved by its recorded
    cursor), so the answer is the lookup as it was at that source
    version."""
    spec = _load_secondary_spec(index_path)
    sec = spec["secondary"]
    cols = sec["cols"]
    vals = tuple(value) if isinstance(value, (tuple, list)) else (value,)
    if len(vals) != len(cols):
        raise ValueError(
            f"index keys {cols} need {len(cols)} value(s), got {vals!r}"
        )
    src = source_table or spec["source_table"]
    idx_version = _resolve_idx_version(
        index_path, src, stale_ok, at_source_version
    )
    # phase 1: shard counters only — parquet column pruning keeps the
    # posting maps unread, so this is cheap even for a skewed value
    counts = _read_index_rows(
        spark, index_path, spec, vals, idx_version, [_SHARD, _CNT]
    ).collect()
    shard_counts = [(r[_SHARD], r[_CNT]) for r in counts]
    total = sum(c for _, c in shard_counts)
    pks_df = None
    if 0 < total <= inlist_cap:
        # phase 2 (selective only): now read the posting maps
        pks_df = _read_index_rows(
            spark, index_path, spec, vals, idx_version, [_PKS]
        )
    return _source_read_for_postings(
        spark, src, at_source_version, shard_counts,
        sec["pk"], sec["pk_shards"], pks_df, inlist_cap,
        big_pred=lambda df: _vals_pred(df, cols, vals),
    )


def lookup_by_many(
    spark: SparkSession,
    index_path: str,
    values: list,
    *,
    source_table: str | None = None,
    stale_ok: bool = False,
    at_source_version: int | None = None,
    inlist_cap: int = INLIST_CAP,
) -> DataFrame:
    """Batch non-key lookup: rows of the SOURCE whose indexed column is
    IN ``values`` (scalars, or tuples for a composite index) — ONE index
    read over the values' candidate buckets, then one source read. Cost
    rides the values' combined selectivity, never the table.

    ``at_source_version``: AS-OF — same contract as lookup_by (the index
    version is resolved by its recorded changefeed cursor, the source
    time-travels to the requested version)."""
    from ..functions.spark_hash import bucket_of

    spec = _load_secondary_spec(index_path)
    sec = spec["secondary"]
    cols, shards = sec["cols"], sec["pk_shards"]
    vtuples = [
        tuple(v) if isinstance(v, (tuple, list)) else (v,) for v in values
    ]
    src = source_table or spec["source_table"]
    idx_version = _resolve_idx_version(
        index_path, src, stale_ok, at_source_version
    )
    idx_nb = read_manifest(index_path, idx_version)["n_buckets"]
    only, key_filter = None, None
    try:
        keys = [
            ivm_key_of([*vals, s]) for vals in vtuples for s in range(shards)
        ]
        only = sorted({bucket_of(k, idx_nb) for k in keys})
        key_filter = F.col(_KEY).isin(keys)
    except TypeError:
        pass
    idx = read_snapshot(spark, index_path, idx_version, only_buckets=only)
    pred = F.lit(False)
    for vals in vtuples:
        pred = pred | _vals_pred(idx, cols, vals)
    if key_filter is not None:
        pred = key_filter & pred
    hits = idx.filter(pred)
    shard_counts = [
        (r[_SHARD], r[_CNT]) for r in hits.select(_SHARD, _CNT).collect()
    ]

    def many_pred(df):
        p = F.lit(False)
        for vals in vtuples:
            p = p | _vals_pred(df, cols, vals)
        return p

    return _source_read_for_postings(
        spark, src, at_source_version, shard_counts,
        sec["pk"], shards, hits, inlist_cap, big_pred=many_pred,
    )


def range_lookup(
    spark: SparkSession,
    index_path: str,
    lo,
    hi,
    *,
    source_table: str | None = None,
    stale_ok: bool = False,
    at_source_version: int | None = None,
    inclusive: bool = True,
    inlist_cap: int = INLIST_CAP,
) -> DataFrame:
    """Rows of the SOURCE whose (single-column) indexed value lies in
    [lo, hi] (or [lo, hi) with ``inclusive=False``). The index itself is
    hash-bucketed, so a range CANNOT prune index buckets — but the index
    is O(distinct values x S) rows, orders of magnitude smaller than the
    source; ONE full index scan with the range pushed to its parquet
    scan is the correct 100 TB plan. What must stay bounded is the
    SOURCE read, and it does: the matching index rows route to source
    buckets exactly as in lookup_by (IN-list plan under the cap, else
    shard->bucket algebra), so source cost rides the range's selectivity,
    never the table.

    ``at_source_version``: AS-OF — same contract as lookup_by (the index
    version is resolved by its recorded changefeed cursor, the source
    time-travels to the requested version)."""
    spec = _load_secondary_spec(index_path)
    sec = spec["secondary"]
    cols, shards = sec["cols"], sec["pk_shards"]
    if len(cols) != 1:
        raise ValueError(
            f"range_lookup needs a single-column index, got keys {cols}"
        )
    col = cols[0]
    src = source_table or spec["source_table"]
    idx_version = _resolve_idx_version(
        index_path, src, stale_ok, at_source_version
    )
    idx = read_snapshot(spark, index_path, idx_version)

    def range_pred(df):
        up = (
            (F.col(col) <= F.lit(hi))
            if inclusive
            else (F.col(col) < F.lit(hi))
        )
        return (F.col(col) >= F.lit(lo)) & up

    hits = idx.filter(range_pred(idx))
    shard_counts = [
        (r[_SHARD], r[_CNT]) for r in hits.select(_SHARD, _CNT).collect()
    ]
    return _source_read_for_postings(
        spark, src, at_source_version, shard_counts,
        sec["pk"], shards, hits, inlist_cap, big_pred=range_pred,
    )
