"""Secondary indexes on snapshot tables, maintained from the change feed.

A snapshot table (plans/merge) answers point reads on its PRIMARY key in
one bucket scan (key_lookup); any other predicate is a full scan. This
module adds the warehouse answer for selective non-key lookups — a
SECONDARY index that is itself just composition of existing primitives:

    index  =  changefeed view  KEYED BY the indexed column,
              measures = [count, hist(primary key)]

The ``hist`` map measure (plans/ivm) stores, per indexed value, the set
of primary keys carrying that value (map pk -> row count). Because hist
is ADDITIVE AND INVERTIBLE, the change feed maintains it exactly:
an update that moves a row from value A to value B retracts the pk from
A's map (update_preimage, weight -1) and adds it to B's
(update_postimage, +1); a value whose count empties leaves the index
(group removal). Sync cost is O(changes) — the changefeed machinery —
never O(table).

Lookups are two bounded point reads:
  1. key_lookup on the INDEX by the value  -> one index bucket scan,
     yielding the pk set (bounded by the value's selectivity);
  2. one read of the SOURCE restricted to the pks' buckets
     (read_snapshot(only_buckets=...)) with an IN filter.

No counterpart in the reference (LanceDB tables are scan-or-ANN only,
src/vectordb/index.ts); modeled on Delta/Hudi secondary-index designs.

Scale posture: index size rides (distinct values x avg pks per value);
lookup cost rides the value's selectivity, not the table. A value
matching half the table is not what a secondary index is for — the
caller picks indexed columns the way they would in any warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .changefeed import create_view_over_table, load_view_spec, sync_view_auto
from .merge import key_lookup, read_manifest, read_snapshot

_PKS = "_pks"
_CNT = "_n"


def create_secondary_index(
    spark: SparkSession,
    source_table: str,
    index_path: str,
    col: str,
    *,
    n_buckets: int = 16,
    at_version: int | None = None,
) -> int:
    """Bootstrap the index over the source's snapshot (current, or
    ``at_version``); later ``sync_secondary_index`` calls ride the
    change feed. The source's primary-key column is read from its
    manifest."""
    pk = read_manifest(source_table)["key"]
    return create_view_over_table(
        spark,
        source_table,
        index_path,
        keys=[col],
        measures=[(_CNT, "count", None), (_PKS, "hist", pk)],
        n_buckets=n_buckets,
        at_version=at_version,
    )


def sync_secondary_index(spark: SparkSession, index_path: str) -> int | None:
    """Advance the index to the source's current version (O(changes));
    the spec sidecar recorded at create time carries source/keys/measures."""
    return sync_view_auto(spark, index_path)


def _index_version_for_source(index_path: str, source_version: int) -> int:
    """The latest INDEX version whose cdf cursor fully reflects exactly
    ``source_version`` — the time-travel join point between the two
    tables' histories (metadata-only: walks the index's manifests)."""
    from .changefeed import _cursor_state
    from .merge import list_versions

    seen = []
    for iv in reversed(list_versions(index_path)):
        cursor, pending = _cursor_state(index_path, iv)
        if cursor == source_version and pending is None:
            return iv
        seen.append((iv, cursor))
    raise ValueError(
        f"no index version reflects source version {source_version} "
        f"(index versions and cursors: {seen}); the index may have "
        "skipped it in one multi-version sync, or vacuum retired it"
    )


def lookup_by(
    spark: SparkSession,
    index_path: str,
    value,
    *,
    source_table: str | None = None,
    stale_ok: bool = False,
    at_source_version: int | None = None,
) -> DataFrame:
    """Rows of the SOURCE whose indexed column equals ``value`` — two
    point reads, never a source scan. Returns an empty frame (source
    schema) when the value is absent.

    Freshness contract: an index lagging the source would silently miss
    rows, so a lookup against a stale index RAISES unless the caller
    passes ``stale_ok=True`` (metadata-only check: the index's recorded
    cursor vs the source's CURRENT pointer).

    ``at_source_version``: AS-OF lookup — both sides time travel to the
    matching versions (the index version is resolved by its recorded
    cursor), so the answer is the lookup as it was at that source
    version."""
    from .changefeed import _cursor_state
    from .merge import current_version

    spec = load_view_spec(index_path)
    src = source_table or spec["source_table"]
    idx_version = None
    if at_source_version is not None:
        idx_version = _index_version_for_source(index_path, at_source_version)
    elif not stale_ok:
        cursor, _pending = _cursor_state(index_path)
        cur = current_version(src)
        if cursor is None or cursor < cur:
            raise ValueError(
                f"index {index_path} is stale (cursor {cursor} < source "
                f"version {cur}); run sync_secondary_index, or pass "
                "stale_ok=True to read the index as of its cursor"
            )
    pk = read_manifest(src)["key"]
    hit = key_lookup(spark, index_path, value, version=idx_version).select(
        _PKS
    ).first()
    if hit is None or not hit[_PKS]:
        # miss path only: the full-snapshot plan exists just to return
        # an empty frame with the source schema — never built on a hit
        snap_all = read_snapshot(spark, src, at_source_version)
        return snap_all.filter(F.lit(False)).drop("bucket")
    pks = sorted(hit[_PKS].keys())
    nb = read_manifest(src, at_source_version)["n_buckets"]
    buckets = sorted(
        r["b"]
        for r in spark.createDataFrame([(p,) for p in pks], f"{pk}_s string")
        .select(
            F.pmod(F.xxhash64(F.col(f"{pk}_s")), F.lit(nb))
            .cast("int")
            .alias("b")
        )
        .distinct()
        .collect()
    )
    from .merge import _typed_key_pred

    narrowed = read_snapshot(
        spark, src, at_source_version, only_buckets=buckets
    )
    # typed IN-list pushes to the parquet scan, so inside each touched
    # bucket the key-sorted row groups prune to the ones holding the pks
    return narrowed.filter(_typed_key_pred(narrowed, pk, pks)).drop("bucket")


def lookup_by_many(
    spark: SparkSession,
    index_path: str,
    values: list,
    *,
    source_table: str | None = None,
    stale_ok: bool = False,
) -> DataFrame:
    """Batch non-key lookup: rows of the SOURCE whose indexed column is
    IN ``values`` — ONE index read over the values' buckets, then one
    source read over the union of their pks' buckets. Cost rides the
    values' combined selectivity, never the table."""
    from .changefeed import _cursor_state
    from .merge import _typed_key_pred, current_version

    spec = load_view_spec(index_path)
    src = source_table or spec["source_table"]
    if not stale_ok:
        cursor, _pending = _cursor_state(index_path)
        cur = current_version(src)
        if cursor is None or cursor < cur:
            raise ValueError(
                f"index {index_path} is stale (cursor {cursor} < source "
                f"version {cur}); run sync_secondary_index, or pass "
                "stale_ok=True"
            )
    col = spec["keys"][0]
    im = read_manifest(index_path)
    svals = [str(v) for v in values]
    vb = sorted(
        r["b"]
        for r in spark.createDataFrame([(s,) for s in svals], "v string")
        .select(
            F.pmod(F.xxhash64("v"), F.lit(im["n_buckets"]))
            .cast("int")
            .alias("b")
        )
        .distinct()
        .collect()
    )
    idx = read_snapshot(spark, index_path, only_buckets=vb)
    pks = sorted(
        {
            p
            for r in idx.filter(_typed_key_pred(idx, col, values))
            .select(F.map_keys(F.col(_PKS)).alias("ks"))
            .collect()
            for p in r["ks"]
        }
    )
    if not pks:
        snap_all = read_snapshot(spark, src)
        return snap_all.filter(F.lit(False)).drop("bucket")
    pk = read_manifest(src)["key"]
    nb = read_manifest(src)["n_buckets"]
    buckets = sorted(
        r["b"]
        for r in spark.createDataFrame([(p,) for p in pks], "p string")
        .select(
            F.pmod(F.xxhash64("p"), F.lit(nb)).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    narrowed = read_snapshot(spark, src, only_buckets=buckets)
    return narrowed.filter(_typed_key_pred(narrowed, pk, pks)).drop("bucket")
