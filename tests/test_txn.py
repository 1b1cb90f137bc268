"""Atomic multi-table commit (plans/txn): a group of table commits —
merge tables, secondary indexes, IVM views — becomes visible together or
not at all, across every crash point of the two-phase protocol."""

import json
import os
import threading

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

import mcp_local_rag_spark.plans.txn as txn_mod
from mcp_local_rag_spark.plans.merge import (
    create_merge_table,
    current_version,
    list_versions,
    merge_into,
    read_snapshot,
    repair_current,
)
from mcp_local_rag_spark.plans.secondary import (
    create_secondary_index,
    lookup_by,
    sync_secondary_index,
)
from mcp_local_rag_spark.plans.txn import (
    TxnAborted,
    recover_txns,
    transaction,
)


def _mk(spark, tmp_path, n=60):
    """A merge table + a synced secondary index on its 'grp' column."""
    src = str(tmp_path / "t_src")
    idx = str(tmp_path / "t_idx")
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 6).cast("string").alias("grp"),
        (F.col("id") * 2).alias("v"),
    )
    create_merge_table(base, src, "k", n_buckets=4)
    create_secondary_index(spark, src, idx, "grp", n_buckets=4)
    return src, idx


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, grp string, v bigint, is_delete boolean"
    )


def test_transaction_commits_source_and_index_together(spark, tmp_path):
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    v_src, v_idx = current_version(src), current_version(idx)

    with transaction(log):
        merge_into(
            spark, src,
            _batch(spark, [Row(k=500, grp="9", v=1, is_delete=False)]),
            delete_col="is_delete",
        )
        sync_secondary_index(spark, idx)
        # read-your-own-writes: the sync above consumed the prepared
        # merge, and an in-block lookup is fresh + sees the new row
        got = {r["k"] for r in lookup_by(spark, idx, "9").collect()}
        assert got == {500}

    assert current_version(src) == v_src + 1
    # sync_view commits two manifests per range (add + retract halves)
    assert current_version(idx) > v_idx
    # the committed state is consistent: freshness check passes, the new
    # row is indexed
    assert {r["k"] for r in lookup_by(spark, idx, "9").collect()} == {500}
    # both manifests carry the SAME txn id (the atomicity witness)
    from mcp_local_rag_spark.plans.merge import read_manifest

    t1 = read_manifest(src)["txn"]["id"]
    t2 = read_manifest(idx)["txn"]["id"]
    assert t1 == t2


def test_outside_readers_see_nothing_until_commit(spark, tmp_path):
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    observed = {}

    def outside_observer():
        # a fresh thread has no txn context: it must see the committed
        # state only
        observed["version"] = current_version(src)
        observed["rows"] = read_snapshot(spark, src).count()

    with transaction(log):
        merge_into(
            spark, src,
            _batch(spark, [Row(k=777, grp="7", v=7, is_delete=False)]),
            delete_col="is_delete",
        )
        assert current_version(src) == 2  # our own view: prepared
        t = threading.Thread(target=outside_observer)
        t.start()
        t.join()
    assert observed == {"version": 1, "rows": 60}
    assert read_snapshot(spark, src).count() == 61  # now visible


def test_block_exception_rolls_back_everything(spark, tmp_path):
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    v_src0, v_idx0 = current_version(src), current_version(idx)
    lv_src0, lv_idx0 = list_versions(src), list_versions(idx)

    with pytest.raises(RuntimeError, match="boom"):
        with transaction(log):
            merge_into(
                spark, src,
                _batch(spark, [Row(k=900, grp="x", v=0, is_delete=False)]),
                delete_col="is_delete",
            )
            sync_secondary_index(spark, idx)
            raise RuntimeError("boom")

    # nothing visible, no orphan manifests, version numbers freed
    assert current_version(src) == v_src0 and current_version(idx) == v_idx0
    assert list_versions(src) == lv_src0 and list_versions(idx) == lv_idx0
    assert read_snapshot(spark, src).count() == 60
    # the table is fully usable and the freed version number is reused
    v = merge_into(
        spark, src,
        _batch(spark, [Row(k=901, grp="y", v=1, is_delete=False)]),
        delete_col="is_delete",
    )
    assert v == 2
    assert {r["k"] for r in read_snapshot(spark, src).collect()} >= {901}
    assert 900 not in {r["k"] for r in read_snapshot(spark, src).collect()}


def test_crash_between_record_and_flip_rolls_forward(
    spark, tmp_path, monkeypatch
):
    """Coordinator dies AFTER the commit record lands but BEFORE any
    CURRENT flips: the transaction IS committed — recover_txns (or any
    later table access via repair_current) finishes the flips."""
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    v_src0, v_idx0 = current_version(src), current_version(idx)

    def dead_flip(table_path, version):
        raise RuntimeError("crashed before flip")

    monkeypatch.setattr(txn_mod, "_flip_current", dead_flip)
    with pytest.raises(RuntimeError, match="crashed before flip"):
        with transaction(log):
            merge_into(
                spark, src,
                _batch(spark, [Row(k=501, grp="9", v=1, is_delete=False)]),
                delete_col="is_delete",
            )
            sync_secondary_index(spark, idx)
    monkeypatch.undo()

    # record says commit, but no pointer moved yet
    assert current_version(src) == v_src0 and current_version(idx) == v_idx0
    recs = [n for n in os.listdir(log) if n.endswith(".json")]
    assert any(not n.endswith(".intent.json") for n in recs)

    report = recover_txns(log)
    assert len(report["committed"]) == 1 and report["aborted"] == []
    assert current_version(src) == v_src0 + 1
    assert current_version(idx) > v_idx0
    assert {r["k"] for r in lookup_by(spark, idx, "9").collect()} == {501}
    # idempotent: a second sweep is a no-op (intent consumed)
    assert recover_txns(log) == {
        "committed": [], "aborted": [], "deferred": [], "pruned_records": 0,
    }


def test_crash_between_record_and_flip_heals_lazily_too(
    spark, tmp_path, monkeypatch
):
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    monkeypatch.setattr(
        txn_mod, "_flip_current",
        lambda *a: (_ for _ in ()).throw(RuntimeError("dead")),
    )
    with pytest.raises(RuntimeError, match="dead"):
        with transaction(log):
            merge_into(
                spark, src,
                _batch(spark, [Row(k=502, grp="8", v=1, is_delete=False)]),
                delete_col="is_delete",
            )
    monkeypatch.undo()
    # ANY later access heals the table without the sweep: a plain writer
    # entry point runs repair_current, which reads the committed record
    # through the manifest's txn marker
    assert repair_current(src) == 2
    assert current_version(src) == 2  # src was created at v1
    assert 502 in {r["k"] for r in read_snapshot(spark, src).collect()}


def test_coordinator_death_mid_prepare_rolls_back(spark, tmp_path):
    """Coordinator dies BEFORE the commit record: the prepared manifest
    is unreachable (CURRENT never moved) and recover_txns aborts the
    in-flight txn, freeing its version number."""
    from mcp_local_rag_spark.plans.merge import _ACTIVE_TXN
    from mcp_local_rag_spark.plans.txn import _write_intent

    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    # simulate death: enter a txn context manually, prepare, never exit
    txn = {
        "id": "deadbeef" * 4,
        "log": os.path.abspath(log),
        "prepared": {},
        "_on_prepare": _write_intent,
    }
    token = _ACTIVE_TXN.set(txn)
    try:
        merge_into(
            spark, src,
            _batch(spark, [Row(k=903, grp="z", v=0, is_delete=False)]),
            delete_col="is_delete",
        )
    finally:
        _ACTIVE_TXN.reset(token)  # the process "dies": no record, no abort

    assert current_version(src) == 1
    assert list_versions(src) == [1, 2]  # prepared manifest lingers
    report = recover_txns(log)
    assert report["aborted"] == [txn["id"]] and report["committed"] == []
    assert list_versions(src) == [1]  # version number freed
    # replaying the work as a proper transaction converges
    with transaction(log):
        merge_into(
            spark, src,
            _batch(spark, [Row(k=903, grp="z", v=0, is_delete=False)]),
            delete_col="is_delete",
        )
        sync_secondary_index(spark, idx)
    assert current_version(src) == 2
    assert {r["k"] for r in lookup_by(spark, idx, "z").collect()} == {903}


def test_concurrent_writer_aborts_inflight_txn(spark, tmp_path):
    """A writer colliding with a PREPARED version resolves the in-flight
    transaction by aborting it (coordinator presumed dead) and wins the
    version; the coordinator's later commit attempt raises TxnAborted
    and nothing of the transaction is visible."""
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    errors = []

    def rival():
        try:
            merge_into(
                spark, src,
                _batch(spark, [Row(k=600, grp="r", v=6, is_delete=False)]),
                delete_col="is_delete", max_retries=3,
            )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    with pytest.raises(TxnAborted):
        with transaction(log):
            merge_into(
                spark, src,
                _batch(spark, [Row(k=601, grp="t", v=6, is_delete=False)]),
                delete_col="is_delete",
            )
            t = threading.Thread(target=rival)  # fresh context: no txn
            t.start()
            t.join()

    assert errors == []
    ks = {r["k"] for r in read_snapshot(spark, src).collect()}
    assert 600 in ks and 601 not in ks
    assert current_version(src) == 2  # the rival's commit


def test_exactly_once_replay_inside_transactions(spark, tmp_path):
    """batch_key replay protection composes with transactions: replaying
    a committed transactional merge is a visible no-op."""
    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")

    def run():
        with transaction(log):
            merge_into(
                spark, src,
                _batch(spark, [Row(k=700, grp="q", v=7, is_delete=False)]),
                delete_col="is_delete", batch_key="ingest:700",
            )
            sync_secondary_index(spark, idx)

    run()
    v1, i1 = current_version(src), current_version(idx)
    run()  # replay: merge no-ops on the batch key, sync has no changes
    assert current_version(src) == v1
    assert current_version(idx) == i1
    assert {r["k"] for r in lookup_by(spark, idx, "q").collect()} == {700}


def test_transactions_do_not_nest(spark, tmp_path):
    log = str(tmp_path / "txlog")
    with pytest.raises(RuntimeError, match="nest"):
        with transaction(log):
            with transaction(log):
                pass


@pytest.mark.slow
def test_txn_crash_matrix_every_window_converges(spark, tmp_path):
    """Systematic crash injection: kill the coordinator at EVERY distinct
    protocol point — after intent, after the first prepare, between
    prepares, after the commit record, after the first flip — and verify
    the invariant at each: recover_txns converges the world to
    all-visible or none-visible, tables stay writable, and a replay of
    the same work (batch-keyed) lands exactly once."""
    from mcp_local_rag_spark.plans.merge import read_snapshot

    crash_points = [
        "after_first_prepare",   # src prepared, index untouched
        "after_second_prepare",  # both prepared, no record
        "after_record",          # committed, no flips
        "after_first_flip",      # committed, flips torn
    ]
    for i, point in enumerate(crash_points):
        src, idx = _mk(spark, tmp_path / f"m{i}")
        log = str(tmp_path / f"m{i}" / "txlog")
        batch = _batch(
            spark, [Row(k=800 + i, grp="m", v=i, is_delete=False)]
        )

        real_flip = txn_mod._flip_current
        real_pub = txn_mod._publish_record
        flips = {"n": 0}

        def flip_crash(t, v, _real=real_flip, _point=point, _flips=flips):
            if _point == "after_record":
                raise RuntimeError("crash")
            if _point == "after_first_flip":
                if _flips["n"] >= 1:
                    raise RuntimeError("crash")
                _flips["n"] += 1
            return _real(t, v)

        def pub_crash(log_dir, txn_id, state, tables,
                      _real=real_pub, _point=point):
            # the coordinator "dies" INSTEAD of publishing its record
            if _point in ("after_first_prepare", "after_second_prepare"):
                raise RuntimeError("crash")
            return _real(log_dir, txn_id, state, tables)

        try:
            if point in ("after_record", "after_first_flip"):
                txn_mod._flip_current = flip_crash
            else:
                txn_mod._publish_record = pub_crash
            # simulate death, not a clean exception-abort: drive the
            # protocol manually so the context manager's abort path
            # can't run
            from mcp_local_rag_spark.plans.merge import _ACTIVE_TXN
            from mcp_local_rag_spark.plans.txn import _write_intent
            import uuid as _uuid

            txn = {
                "id": _uuid.uuid4().hex, "log": os.path.abspath(log),
                "prepared": {}, "_on_prepare": _write_intent,
            }
            token = _ACTIVE_TXN.set(txn)
            try:
                merge_into(spark, src, batch, delete_col="is_delete",
                           batch_key=f"crash:{i}")
                if point != "after_first_prepare":
                    sync_secondary_index(spark, idx)
                if point in ("after_record", "after_first_flip"):
                    tables = {t: vs[-1] for t, vs in txn["prepared"].items()}
                    assert txn_mod._publish_record(
                        txn["log"], txn["id"], "commit", tables
                    )
                    with pytest.raises(RuntimeError, match="crash"):
                        for t, v in sorted(tables.items()):
                            txn_mod._flip_current(t, v)
            finally:
                _ACTIVE_TXN.reset(token)
        finally:
            txn_mod._flip_current = real_flip
            txn_mod._publish_record = real_pub

        committed_expected = point in ("after_record", "after_first_flip")
        report = recover_txns(log)
        if committed_expected:
            assert len(report["committed"]) == 1, point
            ks = {r["k"] for r in read_snapshot(spark, src).collect()}
            assert 800 + i in ks, point
            # index reflects the source exactly (freshness passes)
            got = {r["k"] for r in lookup_by(spark, idx, "m").collect()}
            assert got == {800 + i}, point
        else:
            assert len(report["aborted"]) == 1, point
            ks = {r["k"] for r in read_snapshot(spark, src).collect()}
            assert 800 + i not in ks, point
            assert current_version(src) == 1, point
        # the world is writable and a batch-keyed replay lands exactly once
        with transaction(log):
            merge_into(spark, src, batch, delete_col="is_delete",
                       batch_key=f"crash:{i}")
            sync_secondary_index(spark, idx)
        got = {r["k"] for r in lookup_by(spark, idx, "m").collect()}
        assert got == {800 + i}, point
        assert read_snapshot(spark, src).filter(
            F.col("k") == 800 + i
        ).count() == 1, point


def test_transaction_spans_optimize_and_merge(spark, tmp_path):
    """Every verb that commits through the manifest protocol composes
    with transactions: a merge + clustered OPTIMIZE + index sync group
    becomes visible as one unit, with the clustering marker intact."""
    from mcp_local_rag_spark.plans.merge import (
        optimize_table,
        read_manifest,
    )

    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    v0 = current_version(src)
    with transaction(log):
        merge_into(
            spark, src,
            _batch(spark, [Row(k=950, grp="o", v=5, is_delete=False)]),
            delete_col="is_delete",
        )
        optimize_table(spark, src, ["v"])
        sync_secondary_index(spark, idx)
        assert read_manifest(src)["clustered"]["cols"] == ["v"]  # own view
    assert current_version(src) == v0 + 2  # merge + optimize
    assert read_manifest(src)["clustered"]["cols"] == ["v"]
    assert {r["k"] for r in lookup_by(spark, idx, "o").collect()} == {950}


def test_concurrent_transactions_on_disjoint_tables(spark, tmp_path):
    """Transactions over DISJOINT table groups never interact: two
    threads each run a merge+sync transaction on their own pair; both
    commit, both stay internally consistent."""
    src_a, idx_a = _mk(spark, tmp_path / "a")
    src_b, idx_b = _mk(spark, tmp_path / "b")
    log = str(tmp_path / "txlog")
    errors = []

    def work(src, idx, k, grp):
        try:
            with transaction(log):
                merge_into(
                    spark, src,
                    _batch(
                        spark, [Row(k=k, grp=grp, v=1, is_delete=False)]
                    ),
                    delete_col="is_delete",
                )
                sync_secondary_index(spark, idx)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    t1 = threading.Thread(target=work, args=(src_a, idx_a, 700, "ca"))
    t2 = threading.Thread(target=work, args=(src_b, idx_b, 701, "cb"))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert errors == []
    assert {r["k"] for r in lookup_by(spark, idx_a, "ca").collect()} == {700}
    assert {r["k"] for r in lookup_by(spark, idx_b, "cb").collect()} == {701}


def test_vacuum_reclaims_aborted_txn_data_dirs(spark, tmp_path):
    """An aborted transaction's data dirs are invisible orphans (its
    manifests were unlinked); the EXISTING vacuum sweep reclaims them
    past the grace window, and the table reads on as if the txn never
    happened."""
    from mcp_local_rag_spark.plans.merge import vacuum

    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    with pytest.raises(RuntimeError, match="boom"):
        with transaction(log):
            merge_into(
                spark, src,
                _batch(spark, [Row(k=910, grp="v", v=0, is_delete=False)]),
                delete_col="is_delete",
            )
            raise RuntimeError("boom")
    # the prepared merge wrote a data_v2_<token> dir before its
    # manifest was unlinked (post-v1 dirs carry a race token)
    import glob

    orphans = glob.glob(os.path.join(src, "data_v2_*"))
    assert orphans
    removed = vacuum(src, keep_versions=2, grace_seconds=0)
    assert {os.path.basename(o) for o in orphans} <= {
        os.path.basename(d) for d in removed
    }
    assert not glob.glob(os.path.join(src, "data_v2_*"))
    assert read_snapshot(spark, src).count() == 60
    # and the freed version number still reuses cleanly post-vacuum
    v = merge_into(
        spark, src,
        _batch(spark, [Row(k=911, grp="w", v=1, is_delete=False)]),
        delete_col="is_delete",
    )
    assert v == 2
    assert 911 in {r["k"] for r in read_snapshot(spark, src).collect()}


def test_table_maintain_one_pass(spark, tmp_path):
    """The policy loop (plans/maintain): a table with a wedged pointer,
    a dead in-flight transaction, a scattered snapshot history, and
    vacuum-able orphans converges in ONE pass — and a second pass is a
    no-op."""
    import glob

    from mcp_local_rag_spark.plans.maintain import table_maintain
    from mcp_local_rag_spark.plans.merge import (
        _ACTIVE_TXN,
        list_versions,
        read_manifest,
        read_snapshot,
    )
    from mcp_local_rag_spark.plans.txn import _write_intent

    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    # scatter: three merges leave live files across several data dirs
    for i in range(3):
        merge_into(
            spark, src,
            _batch(spark, [Row(k=i, grp="s", v=i, is_delete=False)]),
            delete_col="is_delete",
        )
    # dead in-flight transaction (prepared manifest, no record)
    import uuid as _uuid

    txn = {"id": _uuid.uuid4().hex, "log": os.path.abspath(log),
           "prepared": {}, "_on_prepare": _write_intent}
    token = _ACTIVE_TXN.set(txn)
    try:
        merge_into(
            spark, src,
            _batch(spark, [Row(k=990, grp="x", v=0, is_delete=False)]),
            delete_col="is_delete",
        )
    finally:
        _ACTIVE_TXN.reset(token)
    # wedge the pointer one version back (crash-before-flip shape)
    with open(os.path.join(src, "_snapshots", "CURRENT")) as f:
        cur = int(f.read())
    with open(os.path.join(src, "_snapshots", "CURRENT"), "w") as f:
        f.write(str(cur - 1))

    # txn_grace_seconds=0: this pass models an OPERATOR-invoked
    # decide-everything-now sweep (the dead txn's intent is seconds old —
    # the cron default of 600 s would rightly defer it; that posture is
    # pinned by test_recover_grace_window_defers_live_txn)
    report = table_maintain(
        spark, src, txn_log=log, txn_grace_seconds=0,
        vacuum_grace_seconds=0, protect_consumers=[idx],
    )
    assert report["healed_to"] == cur
    assert report["txns"]["aborted"] and not report["txns"]["committed"]
    assert report["compacted_to"] == cur + 1  # one compaction rewrite
    assert report["removed_dirs"]  # scattered + orphan dirs collected
    snap = {r["k"]: r["v"] for r in read_snapshot(spark, src).collect()}
    assert snap[0] == 0 and snap[1] == 1 and snap[2] == 2
    assert 990 not in snap  # dead txn rolled back
    m = read_manifest(src)
    assert len(set(m["buckets"].values())) == 1  # compact
    # second pass: metadata-only no-op
    report2 = table_maintain(
        spark, src, txn_log=log, txn_grace_seconds=0,
        vacuum_grace_seconds=0, protect_consumers=[idx],
    )
    assert report2["healed_to"] is None
    assert report2["compacted_to"] is None
    assert report2["removed_dirs"] == []
    # the protected consumer index still syncs after retention
    v = sync_secondary_index(spark, idx)
    assert v == current_version(src)
    got = {r["k"] for r in lookup_by(spark, idx, "s").collect()}
    assert got == {0, 1, 2}


def test_repair_heals_first_commit_inside_txn(spark, tmp_path, monkeypatch):
    """A table whose FIRST-EVER commit was transactional, with the
    coordinator dying after the record but before the flip: there is no
    CURRENT file yet — repair_current must still roll forward instead of
    raising FileNotFoundError."""
    from mcp_local_rag_spark.plans.merge import create_merge_table

    path = str(tmp_path / "firsttxn")
    log = str(tmp_path / "txlog")
    monkeypatch.setattr(
        txn_mod, "_flip_current",
        lambda *a: (_ for _ in ()).throw(RuntimeError("dead")),
    )
    with pytest.raises(RuntimeError, match="dead"):
        with transaction(log):
            create_merge_table(
                spark.range(10).selectExpr("id as k", "id*2 as v"),
                path, "k", n_buckets=2,
            )
    monkeypatch.undo()
    assert not os.path.exists(os.path.join(path, "_snapshots", "CURRENT"))
    assert repair_current(path) == 1
    assert current_version(path) == 1
    assert read_snapshot(spark, path).count() == 10


def test_unlink_if_marked_never_deletes_foreign_manifest(tmp_path):
    """The one shared abort-cleanup guard: a manifest that no longer
    carries the aborting txn's marker (the version number was freed and
    legitimately reused) is left alone."""
    import json

    from mcp_local_rag_spark.plans.txn import unlink_if_marked

    p = str(tmp_path / "v00000005.json")
    with open(p, "w") as f:
        json.dump({"version": 5, "txn": {"id": "AAA", "log": "x"}}, f)
    assert not unlink_if_marked(p, "BBB")  # foreign txn: untouched
    assert os.path.exists(p)
    with open(p, "w") as f:
        json.dump({"version": 5}, f)  # reused by a PLAIN commit
    assert not unlink_if_marked(p, "AAA")
    assert os.path.exists(p)
    with open(p, "w") as f:
        json.dump({"version": 5, "txn": {"id": "AAA", "log": "x"}}, f)
    assert unlink_if_marked(p, "AAA")  # ours: freed
    assert not os.path.exists(p)
    assert not unlink_if_marked(p, "AAA")  # idempotent on missing


def _simulate_dead_coordinator(spark, src, log):
    """Prepare one merge inside a txn context, then 'die' — no record,
    no abort. Returns the txn id."""
    from mcp_local_rag_spark.plans.merge import _ACTIVE_TXN
    from mcp_local_rag_spark.plans.txn import _write_intent

    txn = {
        "id": os.urandom(16).hex(),
        "log": os.path.abspath(log),
        "prepared": {},
        "_on_prepare": _write_intent,
    }
    token = _ACTIVE_TXN.set(txn)
    try:
        merge_into(
            spark, src,
            _batch(spark, [Row(k=9999, grp="g", v=0, is_delete=False)]),
            delete_col="is_delete",
        )
    finally:
        _ACTIVE_TXN.reset(token)
    return txn["id"]


def test_recover_grace_window_defers_live_txn(spark, tmp_path):
    """A cron sweep firing during a LIVE ingest's prepare window must not
    abort a healthy coordinator: undecided txns younger than the grace
    window are deferred untouched; once the intent ages past it they are
    presumed dead and rolled back."""
    import time

    src, _idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    txn_id = _simulate_dead_coordinator(spark, src, log)

    report = recover_txns(log, grace_seconds=300.0)
    assert report["deferred"] == [txn_id]
    assert report["aborted"] == [] and report["committed"] == []
    # prepared manifest untouched, intent still there — the coordinator
    # could still commit
    assert list_versions(src) == [1, 2]
    assert os.path.exists(os.path.join(log, f"{txn_id}.intent.json"))

    old = time.time() - 3600
    os.utime(os.path.join(log, f"{txn_id}.intent.json"), (old, old))
    report = recover_txns(log, grace_seconds=300.0)
    assert report["aborted"] == [txn_id]
    assert list_versions(src) == [1]  # version number freed


def test_record_retention_prunes_only_safe_records(spark, tmp_path):
    """Final txn records are pruned once aged AND nothing can still need
    them: commit records only after every participant's CURRENT reached
    the recorded version; young records and unflipped commits survive."""
    import time

    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    with transaction(log):
        merge_into(
            spark, src,
            _batch(spark, [Row(k=700, grp="q", v=1, is_delete=False)]),
            delete_col="is_delete",
        )
        sync_secondary_index(spark, idx)
    recs = [
        n for n in os.listdir(log)
        if n.endswith(".json") and not n.endswith(".intent.json")
    ]
    assert len(recs) == 1
    rec_path = os.path.join(log, recs[0])

    # too young: kept
    assert recover_txns(log, record_retention_seconds=3600.0)[
        "pruned_records"] == 0
    assert os.path.exists(rec_path)

    # an aged commit record whose table never flipped is NOT prunable —
    # a lingering prepared manifest still resolves through it
    poison = os.path.join(log, "ffff0000" * 4 + ".json")
    with open(poison, "w") as f:
        json.dump({
            "id": "ffff0000" * 4, "state": "commit",
            "tables": {src: 99},
        }, f)
    old = time.time() - 7200
    os.utime(rec_path, (old, old))
    os.utime(poison, (old, old))
    report = recover_txns(log, record_retention_seconds=3600.0)
    assert report["pruned_records"] == 1  # only the flipped commit
    assert not os.path.exists(rec_path)
    assert os.path.exists(poison)
    os.unlink(poison)

    # abort records are re-derivable: age + no intent suffices
    txn_id = _simulate_dead_coordinator(spark, src, log)
    recover_txns(log)  # aborts it, consumes the intent
    ab_path = os.path.join(log, f"{txn_id}.json")
    assert json.load(open(ab_path))["state"] == "abort"
    os.utime(ab_path, (old, old))
    assert recover_txns(log, record_retention_seconds=3600.0)[
        "pruned_records"] == 1
    assert not os.path.exists(ab_path)


def test_flip_current_is_monotonic_under_contention(spark, tmp_path):
    """Hammer _flip_current from many threads — live writers pushing the
    pointer forward interleaved with txn replays flipping OLD versions.
    The flock + uuid-tmp protocol must keep CURRENT monotonic (the r12
    check-then-act window let a replay pass the >= check, lose the race,
    then move CURRENT backwards) and never tear or FileNotFoundError on
    a shared tmp name."""
    from mcp_local_rag_spark.plans.merge import (
        _SNAP_DIR,
        _current_raw,
        _flip_current,
    )

    path = str(tmp_path / "flip_t")
    os.makedirs(os.path.join(path, _SNAP_DIR))
    _flip_current(path, 1)
    errors = []
    observed_regress = []
    stop = threading.Event()

    def observer():
        prev = 0
        while not stop.is_set():
            cur = _current_raw(path)
            if cur < prev:
                observed_regress.append((prev, cur))
            prev = max(prev, cur)

    def flipper(versions):
        try:
            for v in versions:
                _flip_current(path, v)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    obs = threading.Thread(target=observer)
    obs.start()
    threads = [
        threading.Thread(target=flipper, args=([v for v in range(2, 200)],)),
        threading.Thread(target=flipper, args=([v for v in range(199, 1, -1)],)),
        threading.Thread(target=flipper, args=([7] * 300,)),   # stale replay
        threading.Thread(target=flipper, args=([150] * 300,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    obs.join()
    assert errors == []
    assert observed_regress == []
    assert _current_raw(path) == 199


# ---------------------------------------------------------------------------
# Randomized crash/concurrency fuzz (round 13): the crash matrix above
# covers every FIXED protocol window; this drives random interleavings —
# random crash points across prepare/record/flip, intent-less coordinators,
# plain writers colliding with prepares, recovery sweeps at random times,
# stale flip replays — against a pure-python model of committed state.
# The protocol is pure file ops, so a seed costs milliseconds: the fuzz
# drives merge._commit directly with synthetic manifests (no Spark jobs),
# the same manifests the real merge publishes.


def _fuzz_mk_table(path, model):
    from mcp_local_rag_spark.plans.merge import _commit

    os.makedirs(path, exist_ok=True)
    _commit(path, {"version": 1, "payload": "init"}, 1)
    model[path] = {1: "init"}


def _fuzz_plain_write(t, payload, model):
    """A plain writer: repair (resolving any lingering foreign prepare),
    target current+1, retry on collision — merge_into's loop."""
    from mcp_local_rag_spark.plans.merge import (
        ConcurrentCommitError,
        _commit,
        current_version,
        repair_current,
    )

    for _ in range(30):
        repair_current(t)
        v = current_version(t) + 1
        try:
            _commit(t, {"version": v, "payload": payload}, v)
            model[t][v] = payload
            return v
        except ConcurrentCommitError:
            continue
    raise AssertionError("plain write livelocked")


def _fuzz_txn(log, tables, payloads, crash, model, with_intent=True):
    """Drive one transaction manually so a 'crash' is a real dead
    coordinator (no context-manager abort path). ``crash`` is one of
    None (clean), ('prepare', k) (die after k prepares), 'before_record',
    'after_record', ('flip', j) (die after j flips). Returns the final
    record state the model expects ('commit'/'abort')."""
    import uuid as _uuid

    from mcp_local_rag_spark.plans.merge import (
        _ACTIVE_TXN,
        ConcurrentCommitError,
        _commit,
        current_version,
        repair_current,
    )
    from mcp_local_rag_spark.plans.txn import _publish_record, _write_intent

    txn = {
        "id": _uuid.uuid4().hex,
        "log": os.path.abspath(log),
        "prepared": {},
        "_on_prepare": _write_intent if with_intent else None,
    }
    token = _ACTIVE_TXN.set(txn)
    try:
        done = 0
        for t in tables:
            for _ in range(30):
                repair_current(t)
                v = current_version(t) + 1
                try:
                    _commit(t, {"version": v, "payload": payloads[t]}, v)
                    break
                except ConcurrentCommitError:
                    continue
            else:
                raise AssertionError("prepare livelocked")
            done += 1
            if crash == ("prepare", done):
                return "abort"
        if crash == "before_record":
            return "abort"
        tables_v = {t: vs[-1] for t, vs in txn["prepared"].items()}
        assert _publish_record(txn["log"], txn["id"], "commit", tables_v), (
            "single-threaded seed: nobody can race our record"
        )
        for t, v in tables_v.items():
            model[t][v] = payloads[t]
        if crash == "after_record":
            return "commit"
        from mcp_local_rag_spark.plans.merge import _flip_current

        flips = sorted(tables_v.items())
        upto = crash[1] if isinstance(crash, tuple) and crash[0] == "flip" else len(flips)
        for t, v in flips[:upto]:
            _flip_current(t, v)
        return "commit"
    finally:
        _ACTIVE_TXN.reset(token)


@pytest.mark.parametrize("seed_block", range(8))
def test_txn_random_interleaving_fuzz(tmp_path, seed_block):
    """>= 200 seeds of randomized protocol interleavings converge to the
    pure-python model: every commit-recorded transaction is fully visible,
    everything else leaves no trace, version numbers stay contiguous, and
    the tables remain writable."""
    import random

    from mcp_local_rag_spark.plans.merge import (
        _current_raw,
        _flip_current,
        list_versions,
        read_manifest,
        repair_current,
    )

    for seed in range(seed_block * 25, seed_block * 25 + 25):
        rng = random.Random(seed)
        base = tmp_path / f"s{seed}"
        log = str(base / "log")
        tables = [str(base / f"t{i}") for i in range(rng.randint(2, 3))]
        model: dict[str, dict[int, str]] = {}
        for t in tables:
            _fuzz_mk_table(t, model)

        n_ops = rng.randint(6, 14)
        for op_i in range(n_ops):
            op = rng.choices(
                ["txn", "plain", "recover", "repair", "stale_flip"],
                weights=[5, 3, 2, 2, 1],
            )[0]
            if op == "txn":
                subset = rng.sample(tables, rng.randint(1, len(tables)))
                payloads = {
                    t: f"s{seed}o{op_i}:{os.path.basename(t)}" for t in subset
                }
                crash = rng.choice(
                    [None, None, ("prepare", rng.randint(1, len(subset))),
                     "before_record", "after_record",
                     ("flip", rng.randint(0, len(subset)))]
                )
                if isinstance(crash, tuple) and crash[0] == "prepare":
                    crash = ("prepare", min(crash[1], len(subset)))
                _fuzz_txn(
                    log, subset, payloads, crash, model,
                    with_intent=rng.random() > 0.2,
                )
            elif op == "plain":
                t = rng.choice(tables)
                _fuzz_plain_write(t, f"s{seed}o{op_i}:plain", model)
            elif op == "recover":
                recover_txns(log)
            elif op == "repair":
                repair_current(rng.choice(tables))
            elif op == "stale_flip":
                t = rng.choice(tables)
                vs = sorted(model[t])
                if vs:
                    _flip_current(t, rng.choice(vs))  # replay: must be no-op-safe

        # convergence sweep, in random order, twice (idempotence)
        for _ in range(2):
            if rng.random() < 0.5:
                recover_txns(log)
                for t in rng.sample(tables, len(tables)):
                    repair_current(t)
            else:
                for t in rng.sample(tables, len(tables)):
                    repair_current(t)
                recover_txns(log)

        for t in tables:
            cur = _current_raw(t)
            vs = list_versions(t)
            committed = model[t]
            assert cur == max(committed), (seed, t, cur, max(committed))
            assert set(vs) == set(range(1, cur + 1)), (seed, t, vs)
            for v in vs:
                m = read_manifest(t, v)
                assert m["payload"] == committed[v], (seed, t, v)
        # no undecided intent survives the sweep
        leftovers = [
            n for n in os.listdir(log) if n.endswith(".intent.json")
        ] if os.path.isdir(log) else []
        assert leftovers == [], (seed, leftovers)
        # the world stays writable
        t = tables[0]
        v = _fuzz_plain_write(t, "final", model)
        assert _current_raw(t) == v


def test_txn_concurrent_writers_and_recovery_fuzz(tmp_path):
    """True thread concurrency: transactional writers, plain writers, and
    a recovery sweeper race on shared tables. Losing a commit race raises
    TxnAborted (nothing visible); every win is fully visible; version
    numbers stay contiguous and CURRENT converges to the newest commit."""
    import random
    import uuid as _uuid

    from mcp_local_rag_spark.plans.merge import (
        ConcurrentCommitError,
        _commit,
        _current_raw,
        current_version,
        list_versions,
        read_manifest,
        repair_current,
    )

    base = tmp_path / "conc"
    log = str(base / "log")
    tables = [str(base / f"t{i}") for i in range(2)]
    model: dict[str, dict[int, str]] = {}
    for t in tables:
        _fuzz_mk_table(t, model)

    committed_lock = threading.Lock()
    committed: list[tuple[str, dict]] = []  # (payload_tag, {table: version})
    errors: list[BaseException] = []
    stop = threading.Event()

    def txn_writer(wid):
        rng = random.Random(1000 + wid)
        try:
            for i in range(12):
                tag = f"w{wid}i{i}"
                try:
                    with transaction(log) as txn:
                        for t in rng.sample(tables, rng.randint(1, 2)):
                            for _ in range(40):
                                repair_current(t)
                                v = current_version(t) + 1
                                try:
                                    _commit(
                                        t, {"version": v, "payload": tag}, v
                                    )
                                    break
                                except ConcurrentCommitError:
                                    continue
                            else:
                                raise AssertionError("livelock")
                        prepared = {
                            tt: vs[-1] for tt, vs in txn["prepared"].items()
                        }
                    with committed_lock:
                        committed.append((tag, prepared))
                except TxnAborted:
                    pass  # raced: nothing visible, by contract
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def plain_writer(wid):
        rng = random.Random(2000 + wid)
        try:
            for i in range(12):
                t = rng.choice(tables)
                tag = f"p{wid}i{i}"
                for _ in range(60):
                    repair_current(t)
                    v = current_version(t) + 1
                    try:
                        _commit(t, {"version": v, "payload": tag}, v)
                        with committed_lock:
                            committed.append((tag, {t: v}))
                        break
                    except ConcurrentCommitError:
                        continue
                else:
                    raise AssertionError("plain livelock")
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    def sweeper():
        try:
            while not stop.is_set():
                recover_txns(log)
                for t in tables:
                    repair_current(t)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = (
        [threading.Thread(target=txn_writer, args=(i,)) for i in range(3)]
        + [threading.Thread(target=plain_writer, args=(i,)) for i in range(2)]
    )
    sw = threading.Thread(target=sweeper)
    sw.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    stop.set()
    sw.join()
    assert errors == []

    recover_txns(log)
    for t in tables:
        repair_current(t)
    want: dict[str, dict[int, str]] = {t: {1: "init"} for t in tables}
    for tag, prepared in committed:
        for t, v in prepared.items():
            want[t][int(v)] = tag
    for t in tables:
        cur = _current_raw(t)
        vs = list_versions(t)
        assert cur == max(want[t]), (t, cur, max(want[t]))
        assert set(vs) == set(range(1, cur + 1)), (t, sorted(vs)[:5], cur)
        for v in vs:
            assert read_manifest(t, v)["payload"] == want[t][v], (t, v)


def test_maintenance_races_live_writer_and_converges(spark, tmp_path):
    """table_maintain from cron while a writer loop merges (round 13,
    the unit-scale twin of the WAREHOUSE_SCALE maintain_under_traffic
    probe): no pass may abort a healthy writer (grace window), compaction
    retries its version races, vacuum never reclaims a live dir — the
    quiesced table carries exactly the declarative final state."""
    from mcp_local_rag_spark.plans.maintain import table_maintain
    from mcp_local_rag_spark.plans.merge import (
        _current_raw,
        create_merge_table,
        list_versions,
        read_snapshot,
    )

    path = str(tmp_path / "mt_traffic")
    base = spark.range(300).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("grp"),
        F.lit(0).cast("long").alias("v"),
    )
    create_merge_table(base, path, "k", n_buckets=4)
    errors: list = []
    N = 5

    def writer():
        try:
            for i in range(1, N + 1):
                delta = spark.range(50).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 5).cast("string").alias("grp"),
                    F.lit(i).cast("long").alias("v"),
                    F.lit(False).alias("is_delete"),
                )
                merge_into(
                    spark, path, delta, delete_col="is_delete", max_retries=16
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(f"writer: {e!r}")

    def maintainer():
        try:
            for _ in range(4):
                table_maintain(
                    spark, path,
                    vacuum_keep_versions=2, vacuum_grace_seconds=2.0,
                )
        except BaseException as e:  # noqa: BLE001
            errors.append(f"maint: {e!r}")

    tw = threading.Thread(target=writer)
    tm = threading.Thread(target=maintainer)
    tw.start()
    tm.start()
    tw.join()
    tm.join()
    assert errors == []
    table_maintain(spark, path, vacuum_keep_versions=2, vacuum_grace_seconds=2.0)
    snap = read_snapshot(spark, path)
    assert snap.count() == 300  # no lost rows
    got = {r["k"]: r["v"] for r in snap.filter(F.col("k") < 50).collect()}
    assert got == {k: N for k in range(50)}  # last merge won everywhere
    assert {
        r["v"] for r in snap.filter(F.col("k") >= 50).select("v").distinct().collect()
    } == {0}
    vs = list_versions(path)
    assert _current_raw(path) == max(vs)


def test_graced_maintenance_never_aborts_live_coordinator(spark, tmp_path):
    """The round-13 review finding: table_maintain's opening
    repair_current used to insta-abort a healthy in-flight transaction
    found via the table's own prepared manifest — before the graced
    recover_txns got a say. With the maintenance grace applied to the
    heal too, a cron pass defers the young txn and the coordinator
    commits normally afterwards."""
    from mcp_local_rag_spark.plans.maintain import table_maintain
    from mcp_local_rag_spark.plans.merge import _ACTIVE_TXN, repair_current
    from mcp_local_rag_spark.plans.txn import _write_intent
    import uuid as _uuid

    src, idx = _mk(spark, tmp_path)
    log = str(tmp_path / "txlog")
    txn = {"id": _uuid.uuid4().hex, "log": os.path.abspath(log),
           "prepared": {}, "_on_prepare": _write_intent}
    token = _ACTIVE_TXN.set(txn)
    try:
        merge_into(
            spark, src,
            _batch(spark, [Row(k=707, grp="g", v=7, is_delete=False)]),
            delete_col="is_delete",
        )
        # cron fires mid-prepare (inside the coordinator's open window,
        # simulated from its own thread with the context masked)
        outcome = {}

        def cron():
            outcome["report"] = table_maintain(
                spark, src, txn_log=log,
                txn_grace_seconds=600.0, vacuum_grace_seconds=600.0,
            )

        t = threading.Thread(target=cron)
        t.start()
        t.join()
        assert outcome["report"]["healed_to"] is None  # deferred, not adopted
        assert outcome["report"]["txns"]["deferred"] == [txn["id"]]
        assert outcome["report"]["txns"]["aborted"] == []
        # the prepared manifest survived the pass
        assert 2 in list_versions(src)
        # coordinator still alive: publish the record and flip
        from mcp_local_rag_spark.plans.txn import _publish_record

        tables = {t_: vs[-1] for t_, vs in txn["prepared"].items()}
        assert _publish_record(txn["log"], txn["id"], "commit", tables)
    finally:
        _ACTIVE_TXN.reset(token)
    repair_current(src)  # anyone's later access finishes the flip
    assert current_version(src) == 2
    assert 707 in {r["k"] for r in read_snapshot(spark, src).collect()}
