"""Change-feed-driven view maintenance: CDC out of a snapshot table.

plans/merge gives CDC *into* a table (MERGE) and a net change feed
*out* of it (read_changes); plans/ivm folds additive deltas into a
rollup. This module closes the loop: a downstream aggregate view kept
current by consuming the upstream table's change feed — the
materialized-view-over-CDF pattern every warehouse pipeline ends in
(Delta CDF -> streaming agg, Iceberg incremental scan -> rollup). The
reference has no incremental story at all (whole-file replace,
src/server/index.ts:644-702); at 100 TB the downstream MUST cost
O(changes), never O(table).

Exactly-once without a side channel: the consumer's cursor is encoded in
the ivm batch keys recorded inside the view's own atomic manifest
commits. Each sync of source range (a, b] is two folds —
``cdf:+a->b`` (insert/update_postimage rows, weight +1) then
``cdf:-a->b`` (delete/update_preimage rows, weight -1). The cursor is
the largest b whose *retract* half landed; a crash between the halves
leaves a dangling ``+a->b``, and the next sync replays exactly that
range first — the add half no-ops on its recorded key, the retract half
completes it. Only then does the cursor advance, so no range is ever
skipped or double-folded, and a transiently-added-not-yet-retracted
state is visible at most between the two commits of one sync.

Scale posture: each sync reads only the source buckets whose manifest
pointer moved in (a, b] (read_changes) and rewrites only the view
buckets the changed keys hash into (ivm_apply) — both sides O(delta).
Vacuuming the source must retain the cursor's manifest
(``vacuum(keep_versions=...)`` spanning the consumer lag); a vacuumed-
away cursor fails fast with the missing-manifest error.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ivm import ivm_apply, ivm_create
from .merge import current_version, read_changes, read_manifest, read_snapshot

_SPEC = "_view_spec.json"

_ADD = re.compile(r"^cdf:\+(\d+)->(\d+)$")
_RET = re.compile(r"^cdf:-(\d+)->(\d+)$")
_BOOT = re.compile(r"^cdf:bootstrap->(\d+)$")

_POST = ("insert", "update_postimage")
_PRE = ("delete", "update_preimage")


def _cursor_state(
    view_table: str, version: int | None = None
) -> tuple[int | None, tuple[int, int] | None]:
    """(cursor, pending): cursor = the source version the view fully
    reflects (as of the view's own ``version``); pending = a
    half-applied (a, b) range to finish first."""
    applied = read_manifest(view_table, version).get("applied", [])
    boot = [int(m.group(1)) for k in applied if (m := _BOOT.match(k))]
    adds = {(int(m.group(1)), int(m.group(2))) for k in applied if (m := _ADD.match(k))}
    rets = {(int(m.group(1)), int(m.group(2))) for k in applied if (m := _RET.match(k))}
    # a retract key alone proves the range completed: the retract half
    # commits strictly AFTER the add half, so its presence implies the
    # add landed even when the bounded applied-log trim (_APPLIED_KEEP)
    # cut the window between the pair's two keys
    done = [b for _, b in rets]
    cursor = max(boot + done) if boot or done else None
    dangling = sorted(adds - rets)
    return cursor, (dangling[0] if dangling else None)


def create_view_over_table(
    spark: SparkSession,
    source_table: str,
    view_table: str,
    keys: list[str],
    measures: list[tuple],
    *,
    transform=None,
    at_version: int | None = None,
    n_buckets: int = 16,
) -> int:
    """Bootstrap the view from one full snapshot read (the only
    table-sized cost the view ever pays); later syncs ride the feed.
    Returns the bootstrapped source version (the initial cursor)."""
    has_transform = transform is not None
    transform = transform or (lambda df: df)
    snap_v = at_version if at_version is not None else current_version(source_table)
    base = transform(read_snapshot(spark, source_table, snap_v).drop("bucket"))
    ivm_create(spark, view_table, base, keys, measures, n_buckets=n_buckets)
    ivm_apply(
        spark, view_table, base, keys, measures,
        batch_key=f"cdf:bootstrap->{snap_v}",
    )
    # record the view's spec so later syncs (CLI, a restarted job) need
    # only the view path; a python transform can't be serialized, so
    # such views must be synced through the library API
    spec = {
        "source_table": os.path.abspath(source_table),
        "keys": list(keys),
        "measures": [list(m) for m in measures],
        "transform": "custom" if has_transform else None,
    }
    with open(os.path.join(view_table, _SPEC), "w") as f:
        json.dump(spec, f)
    return snap_v


def load_view_spec(view_table: str) -> dict:
    with open(os.path.join(view_table, _SPEC)) as f:
        return json.load(f)


def sync_view_auto(
    spark: SparkSession, view_table: str, *, source_table: str | None = None
) -> int | None:
    """Advance a spec-recorded view (see create_view_over_table) without
    re-supplying keys/measures — the CLI/restart path. Views created
    with a custom ``transform`` cannot be auto-synced."""
    spec = load_view_spec(view_table)
    if spec.get("transform"):
        raise ValueError(
            "view was created with a custom transform; sync it via "
            "sync_view(...) with the same transform"
        )
    return sync_view(
        spark,
        source_table or spec["source_table"],
        view_table,
        spec["keys"],
        [tuple(m) for m in spec["measures"]],
    )


def sync_view(
    spark: SparkSession,
    source_table: str,
    view_table: str,
    keys: list[str],
    measures: list[tuple],
    *,
    transform=None,
) -> int | None:
    """Advance the view to the source's CURRENT version by folding the
    net change feed since the cursor. Returns the new cursor, or None
    when already current. Safe to re-run after any crash."""
    transform = transform or (lambda df: df)
    cursor, pending = _cursor_state(view_table)
    if cursor is None:
        raise ValueError(
            f"view {view_table} has no cdf cursor; bootstrap it with "
            "create_view_over_table"
        )

    def fold(a: int, b: int) -> None:
        from .ivm import has_non_invertible, ivm_commit_key

        ch = read_changes(spark, source_table, a, b)
        adds = transform(ch.filter(F.col("_change_type").isin(*_POST)).drop("_change_type"))
        rets = transform(ch.filter(F.col("_change_type").isin(*_PRE)).drop("_change_type"))
        ivm_apply(
            spark, view_table, adds, keys, measures,
            batch_key=f"cdf:+{a}->{b}",
        )
        ret_key = f"cdf:-{a}->{b}"
        if has_non_invertible(measures):
            # min/max/sketch measures have no inverse: the view is only
            # maintainable over an APPEND-ONLY source. An insert-only
            # range still needs the retract half's cursor key recorded
            # (data-less commit); a range carrying deletes/updates is a
            # hard error, not a silent wrong answer.
            if rets.limit(1).count() > 0:
                raise ValueError(
                    f"source range ({a}, {b}] carries deletes/updates but "
                    "the view has non-invertible measures (min/max/"
                    "sketches) — such views are append-only; rebuild the "
                    "view or drop those measures"
                )
            ivm_commit_key(spark, view_table, ret_key)
        else:
            ivm_apply(
                spark, view_table, rets, keys, measures,
                weight=-1, batch_key=ret_key,
            )

    if pending is not None:
        # finish the half-applied range EXACTLY as recorded before
        # looking at newer versions — replaying a different range would
        # double-fold its overlap
        fold(*pending)
        cursor = max(cursor or 0, pending[1])

    cur = current_version(source_table)
    if cursor >= cur:
        return pending[1] if pending else None
    fold(cursor, cur)
    return cur
