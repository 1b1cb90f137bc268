"""Snapshot-table maintenance policy loop — the warehouse twin of
plans/ann_index.ivf_maintain.

The lifecycle verbs exist separately (repair_current, recover_txns,
compact_snapshots, vacuum, each with its own contract); what an operator
actually runs is ONE idempotent pass per table per maintenance window.
This composes them in the only safe order:

  1. heal    repair_current — adopt any published-but-unflipped manifest
             (including committed-transaction roll-forwards via the txn
             marker resolution inside repair_current).
  2. recover recover_txns(txn_log) when a transaction log is given —
             finish committed cross-table transactions, roll back dead
             in-flight ones (frees their version numbers and leaves
             their data dirs as vacuum-able orphans).
  3. compact compact_snapshots(max_dirs) — one rewrite when the CURRENT
             snapshot's live files scatter across too many dirs;
             clustered tables rewrite in their cluster order, so the
             OPTIMIZE property is preserved, never re-planned here.
  4. vacuum  retire old manifests + unreferenced dirs (aborted-txn and
             lost-race orphans included), under the full protection set
             (grace window, changefeed consumers, savepoints).

Order matters: heal/recover BEFORE compact (compacting a wedged table
would target a colliding version number), compact BEFORE vacuum (the
rewrite retires the scattered dirs that vacuum then collects once they
age out of their manifests). The whole pass is metadata-only unless
compaction actually triggers — safe to run from cron against every
table. The reference's one-size `optimize()` after each mutation
(src/server/index.ts:716-737) is the per-write analogue; this is the
table-lifetime one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .merge import (
    ConcurrentCommitError,
    compact_snapshots,
    repair_current,
    vacuum,
)


def table_maintain(
    spark: SparkSession,
    table_path: str,
    *,
    txn_log: str | None = None,
    txn_grace_seconds: float = 600.0,
    txn_record_retention_seconds: float | None = 86_400.0,
    compact_max_dirs: int = 1,
    vacuum_keep_versions: int = 2,
    vacuum_grace_seconds: float = 600.0,
    protect_consumers: list[str] | None = None,
    protect_savepoints: str | None = None,
) -> dict:
    """One maintenance pass over ``table_path``; returns a report dict
    (healed version, txn recovery counts, compacted-to version, removed
    dirs). Idempotent: a second immediate pass is a metadata-only no-op.
    """
    # the heal honors the SAME grace window as the txn sweep below: a
    # cron pass finding a young undecided transaction via the table's own
    # manifests must not abort its healthy coordinator either — only a
    # colliding WRITER takes that trade (it has a version number to win)
    healed = repair_current(table_path, inflight_grace=txn_grace_seconds)
    recovered = None
    if txn_log is not None:
        from .txn import recover_txns

        # cron-safety: a sweep firing during a LIVE ingest's prepare
        # window must not abort a healthy coordinator — only txns whose
        # intent has aged past the grace window are presumed dead
        # (explicit `txn-recover` keeps grace 0 for operator use)
        recovered = recover_txns(
            txn_log,
            grace_seconds=txn_grace_seconds,
            record_retention_seconds=txn_record_retention_seconds,
        )
    # a live writer racing the maintenance window may win compaction's
    # version number — re-derive and retry like merge_into does, and if
    # the table is THAT busy, skip compaction this cycle rather than
    # aborting the pass before vacuum (cron-safety: the rest of the
    # pass must still run)
    compacted = None
    for _ in range(3):
        try:
            compacted = compact_snapshots(
                spark, table_path, max_dirs=compact_max_dirs,
                inflight_grace=txn_grace_seconds,
            )
            break
        except ConcurrentCommitError:
            # still graced: losing the version race to a PREPARED txn
            # manifest means deferring compaction this cycle, not
            # aborting the healthy coordinator that owns it
            repair_current(table_path, inflight_grace=txn_grace_seconds)
    removed = vacuum(
        table_path,
        keep_versions=vacuum_keep_versions,
        grace_seconds=vacuum_grace_seconds,
        protect_consumers=protect_consumers,
        protect_savepoints=protect_savepoints,
    )
    return {
        "healed_to": healed,
        "txns": recovered,
        "compacted_to": compacted,
        "removed_dirs": removed,
    }
