"""Atomic multi-table commit — a transaction log over the manifest
primitives.

The reference simulates single-table transactions with backup/restore
around a whole-file replace (src/server/index.ts:644-702); plans/merge
already gives each table atomic versioned commits. What neither gives is
CROSS-table atomicity: an ingest advances the chunks table, the FTS
postings, and any secondary indexes through SEPARATE manifest commits, so
a crash between them leaves indexes guarded-but-stale (the freshness
checks catch it, but the fix is manual). This module makes a group of
table commits advance together or not at all, with nothing beyond the
existing O_EXCL-link primitive:

  PREPARE   every commit issued inside ``transaction(log_dir)`` publishes
            its manifest as usual (v{N}.json via os.link — the version
            number is reserved, concurrent writers collide exactly as
            they do today) but carries a txn marker and does NOT flip
            CURRENT. Reads inside the block resolve prepared tables to
            their prepared versions (read-your-own-writes: an index sync
            inside the block sees the block's own merge), while every
            outside reader keeps seeing the committed state.
  COMMIT    one record — <log_dir>/<txn_id>.json, fsync'd tmp + os.link —
            is the commit point. Exactly one final record can ever land
            for a txn id (the same O_EXCL semantics as manifests), so a
            recovery racing the coordinator resolves deterministically.
  FLIP      after the record lands, every prepared table's CURRENT rolls
            forward (monotonic — replays can't move a table backwards).
            A crash between record and flips is healed by ANY later
            access: repair_current sees the prepared manifest, reads the
            committed record through the marker, and flips.
  ABORT     on a block exception (or a recovery deciding an in-flight txn
            whose coordinator died) the final record says "abort" and the
            prepared manifests are unlinked — version numbers are freed,
            no data dir is ever adopted. Data dirs written by the aborted
            txn are invisible orphans, exactly like a crashed plain merge.

Liveness contract: a writer that collides with a PREPARED version resolves
the transaction rather than waiting — if the final record exists it
applies it; if not, it races an abort record. A transaction is therefore
abortable by any concurrent writer on a participant table until its
record lands. That is the right trade for this protocol: the expensive
work (Spark jobs writing data dirs) happens before the first prepare, so
the prepare->record window is a handful of tiny JSON publishes.

An INTENT sidecar (<txn_id>.intent.json, rewritten tmp+rename on each
prepare) lists the prepared manifests so ``recover_txns(log_dir)`` can
finish or clean up every transaction in one sweep after a crash — without
it, recovery still happens lazily per table via repair_current.

No counterpart in the reference (single LanceDB table); modeled on the
two-phase manifest publish of multi-table transactions in Delta/Iceberg
catalog designs (one atomic swap governs many tables).
"""

from __future__ import annotations

import json
import os
import uuid
from contextlib import contextmanager

from .merge import _ACTIVE_TXN, _flip_current, _snap_path


class TxnAborted(RuntimeError):
    """The transaction lost its commit race: a concurrent writer (or a
    recovery sweep) aborted it while it was preparing. Nothing was made
    visible; re-run the block."""


def _record_path(log_dir: str, txn_id: str) -> str:
    return os.path.join(log_dir, f"{txn_id}.json")


def _intent_path(log_dir: str, txn_id: str) -> str:
    return os.path.join(log_dir, f"{txn_id}.intent.json")


def read_record(log_dir: str, txn_id: str) -> dict | None:
    try:
        with open(_record_path(log_dir, txn_id)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _publish_record(
    log_dir: str, txn_id: str, state: str, tables: dict[str, int]
) -> bool:
    """O_EXCL-link the txn's FINAL record; False = another record won
    the race (read it back to learn the outcome)."""
    os.makedirs(log_dir, exist_ok=True)
    tmp = os.path.join(log_dir, f".{txn_id}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump({"id": txn_id, "state": state, "tables": tables}, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _record_path(log_dir, txn_id))
    except FileExistsError:
        os.unlink(tmp)
        return False
    os.unlink(tmp)
    return True


def _write_intent(txn: dict) -> None:
    os.makedirs(txn["log"], exist_ok=True)
    tmp = _intent_path(txn["log"], txn["id"]) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"id": txn["id"], "prepared": txn["prepared"]}, f
        )
    os.replace(tmp, _intent_path(txn["log"], txn["id"]))


def unlink_if_marked(manifest_path: str, txn_id: str) -> bool:
    """Unlink ``manifest_path`` ONLY if it still carries ``txn_id``'s
    marker — the one shared guard for every abort-cleanup site
    (coordinator rollback, recovery sweep, repair_current): between
    deciding to free a version number and unlinking it, another repairer
    may already have freed it and a writer legitimately reused it for
    its own commit, which must never be deleted.

    The read-then-unlink runs under the table's snapshot flock
    (merge._snap_lock), which serializes every cleaner while writers —
    who only CREATE names via O_EXCL link, never mutate them — proceed
    lock-free: a manifest that reads as ours cannot change before the
    unlink, and a foreign manifest is simply left alone. (The previous
    claim-by-rename protocol took the name OFF the namespace for a
    window; under heavy contention a writer could reuse the name
    mid-claim and the restoring link lost — the round-13 concurrency
    fuzz caught a committed manifest stranded as a .claim orphan.)"""
    from .merge import _snap_lock

    with _snap_lock(os.path.dirname(manifest_path)):
        try:
            with open(manifest_path) as f:
                m = json.load(f)
        except FileNotFoundError:
            return False
        except json.JSONDecodeError:
            m = {}
        if (m.get("txn") or {}).get("id") != txn_id:
            return False
        os.unlink(manifest_path)
        return True


def _cleanup_prepared(prepared: dict[str, list[int]], txn_id: str) -> None:
    """Unlink the txn's prepared manifests (marker-checked, see
    unlink_if_marked)."""
    for table, versions in prepared.items():
        for v in versions:
            unlink_if_marked(_snap_path(table, int(v)), txn_id)


def resolve_txn(txn_info: dict, *, abort_inflight: bool = True) -> dict:
    """The final record for a prepared manifest's txn marker, deciding an
    in-flight transaction by racing an abort record (repair_current's
    path: a concurrent writer never waits on a coordinator that may be
    dead). With ``abort_inflight=False`` an undecided txn returns
    ``{"state": "inflight"}`` instead."""
    rec = read_record(txn_info["log"], txn_info["id"])
    if rec is not None:
        return rec
    if not abort_inflight:
        return {"id": txn_info["id"], "state": "inflight", "tables": {}}
    _publish_record(txn_info["log"], txn_info["id"], "abort", {})
    return read_record(txn_info["log"], txn_info["id"])


@contextmanager
def transaction(log_dir: str):
    """Run a block of table commits as one atomic unit::

        with transaction(log) as txn:
            merge_into(spark, chunks, batch, ...)          # prepares
            sync_secondary_index(spark, idx)               # sees the merge
        # <- single commit record; both CURRENTs flip together

    On a block exception nothing becomes visible (prepared manifests are
    unlinked, version numbers freed). Raises TxnAborted if a concurrent
    writer resolved the transaction first. Nesting is not supported —
    one transaction per context."""
    if _ACTIVE_TXN.get() is not None:
        raise RuntimeError("transactions do not nest")
    txn = {
        "id": uuid.uuid4().hex,
        "log": os.path.abspath(log_dir),
        "prepared": {},
        "_on_prepare": _write_intent,
    }
    token = _ACTIVE_TXN.set(txn)
    try:
        yield txn
    except BaseException:
        _ACTIVE_TXN.reset(token)
        if txn["prepared"]:
            _publish_record(txn["log"], txn["id"], "abort", {})
            # whatever the record outcome (only a racer's abort can beat
            # ours — commit is coordinator-only), the prepares are dead
            _cleanup_prepared(txn["prepared"], txn["id"])
            _remove_intent(txn)
        raise
    _ACTIVE_TXN.reset(token)
    if not txn["prepared"]:
        return
    tables = {t: vs[-1] for t, vs in txn["prepared"].items()}
    if not _publish_record(txn["log"], txn["id"], "commit", tables):
        rec = read_record(txn["log"], txn["id"])
        _cleanup_prepared(txn["prepared"], txn["id"])
        _remove_intent(txn)
        raise TxnAborted(
            f"transaction {txn['id']} was aborted by a concurrent writer "
            f"(record state: {rec['state'] if rec else 'missing'}); "
            "nothing was committed — re-run the block"
        )
    for t, v in sorted(tables.items()):
        _flip_current(t, v)
    _remove_intent(txn)


def _remove_intent(txn: dict) -> None:
    try:
        os.unlink(_intent_path(txn["log"], txn["id"]))
    except FileNotFoundError:
        pass


def recover_txns(
    log_dir: str,
    *,
    grace_seconds: float = 0.0,
    record_retention_seconds: float | None = None,
) -> dict:
    """One sweep finishing every transaction the log knows about:
    committed ones roll forward (flip any CURRENT the coordinator did
    not live to flip), decided-aborted ones roll back, and UNDECIDED
    in-flight ones are aborted only once their intent is older than
    ``grace_seconds`` — a sweep fired from cron during a live ingest's
    prepare window must not kill a healthy coordinator (the same
    age-based liveness heuristic as vacuum's grace window; younger
    undecided txns are reported as "deferred" and left alone).
    ``grace_seconds=0`` keeps the original presumed-dead semantics for
    explicit operator invocation.

    ``record_retention_seconds`` bounds the log directory: a FINAL
    record (<txn_id>.json) older than the retention with no surviving
    intent is pruned once nothing can still need it — for commits, every
    participant table's CURRENT has advanced to (or past) the recorded
    version, so no manifest above CURRENT still resolves through it; an
    abort record is re-derivable (any racer re-publishes one), so age +
    no-intent suffices. Idempotent; returns
    {"committed": [...], "aborted": [...], "deferred": [...],
    "pruned_records": N}."""
    import time

    committed: list[str] = []
    aborted: list[str] = []
    deferred: list[str] = []
    pruned = 0
    if not os.path.isdir(log_dir):
        return {
            "committed": committed,
            "aborted": aborted,
            "deferred": deferred,
            "pruned_records": pruned,
        }
    now = time.time()
    live_intents: set[str] = set()
    for name in sorted(os.listdir(log_dir)):
        if not name.endswith(".intent.json") or name.startswith("."):
            continue
        path = os.path.join(log_dir, name)
        try:
            with open(path) as f:
                intent = json.load(f)
        except FileNotFoundError:
            continue
        txn_id = intent["id"]
        rec = resolve_txn({"log": log_dir, "id": txn_id}, abort_inflight=False)
        if rec["state"] == "inflight":
            try:
                # clamp: clock skew / a log dir copied from another host
                # can put an intent mtime in the FUTURE — a negative age
                # must not defer under grace_seconds=0, whose documented
                # contract is the original decide-everything sweep
                age = max(0.0, now - os.path.getmtime(path))
            except FileNotFoundError:
                continue
            if grace_seconds > 0 and age < grace_seconds:
                deferred.append(txn_id)
                live_intents.add(txn_id)
                continue
            rec = resolve_txn({"log": log_dir, "id": txn_id})
        if rec["state"] == "commit":
            for t, v in sorted(rec["tables"].items()):
                _flip_current(t, int(v))
            committed.append(txn_id)
        else:
            _cleanup_prepared(intent["prepared"], txn_id)
            aborted.append(txn_id)
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass
    if record_retention_seconds is not None:
        for name in sorted(os.listdir(log_dir)):
            if (
                not name.endswith(".json")
                or name.endswith(".intent.json")
                or name.startswith(".")
            ):
                continue
            path = os.path.join(log_dir, name)
            try:
                if now - os.path.getmtime(path) < record_retention_seconds:
                    continue
                with open(path) as f:
                    rec = json.load(f)
            except (FileNotFoundError, json.JSONDecodeError):
                continue
            if rec.get("id") in live_intents or os.path.exists(
                _intent_path(log_dir, rec.get("id", ""))
            ):
                continue
            if rec.get("state") == "commit":
                from .merge import _current_raw

                try:
                    flipped = all(
                        _current_raw(t) >= int(v)
                        for t, v in rec.get("tables", {}).items()
                    )
                except FileNotFoundError:
                    flipped = False
                if not flipped:
                    continue
            try:
                os.unlink(path)
                pruned += 1
            except FileNotFoundError:
                pass
    return {
        "committed": committed,
        "aborted": aborted,
        "deferred": deferred,
        "pruned_records": pruned,
    }
