"""Shard re-pack maintenance (plans/repack.py): sparse/small shards merge
into full new shards under the intent protocol — liveness from the
table, zero-text samples preserved, crash recovery convergent from every
protocol window, identity re-keying documented and provenance-stable."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from mcp_local_rag_spark.engine import RagEngine
from mcp_local_rag_spark.sources.webdataset import write_tar_shard

BODY = (
    "Repackable prose long enough to clear the minimum chunk gate with "
    "room. A second sentence keeps the chunker comfortable.\n"
)


def _mk_shard(path, names, *, with_json=False):
    members = []
    for n in names:
        members.append((f"{n}.md", (f"# {n}\n\n" + BODY).encode()))
        if with_json:
            members.append((f"{n}.json", b"{}"))
    path.write_bytes(write_tar_shard(members))


def _titles(eng):
    eng.spark.catalog.refreshByPath(eng.table_path)
    return {r.fileTitle for r in eng.chunks().collect()}


def test_repack_merges_sparse_shards_and_preserves_content(spark, tmp_path):
    drop = tmp_path / "drop"
    drop.mkdir()
    # two shards of 4 samples each; a third healthy one
    _mk_shard(drop / "a.tar", [f"a{i}" for i in range(4)], with_json=True)
    _mk_shard(drop / "b.tar", [f"b{i}" for i in range(4)])
    _mk_shard(drop / "c.tar", [f"c{i}" for i in range(4)])
    eng = RagEngine(spark, str(tmp_path / "table"))
    eng.sync_shards(str(drop))
    assert _titles(eng) == {f"{p}{i}" for p in "abc" for i in range(4)}

    # curate away most of a and b (3 of 4 samples each) -> 25% utilization
    from mcp_local_rag_spark.plans.ingest import delete_documents

    dead = [
        r.filePath
        for r in eng.chunks()
        .filter(
            F.col("filePath").rlike("#(a[123]|b[123])\\.md$")
        )
        .select("filePath").distinct().collect()
    ]
    assert len(dead) == 6
    delete_documents(spark, eng.table_path, dead)
    eng.recover_indexes()

    # threshold 0.5, small = samples_per_shard//2 = 2: a and b qualify
    # (utilization 0.25), c does not (1.0 and size 4 >= 2)
    rep = eng.repack_shards(str(drop), samples_per_shard=4)
    assert not rep["noop"]
    assert sorted(os.path.basename(p) for p in rep["candidates"]) == [
        "a.tar", "b.tar",
    ]
    assert rep["samples_kept"] == 2 and rep["samples_dropped"] == 6
    assert not (drop / "a.tar").exists() and not (drop / "b.tar").exists()
    assert (drop / "c.tar").exists()
    new = [p for p in rep["new_shards"]]
    assert new and all(os.path.exists(p) for p in new)
    # a0 + b0 merged into one new shard; text content served identically
    got = _titles(eng)
    assert got == {"a0", "b0"} | {f"c{i}" for i in range(4)}
    # zero-text json member of a0 travels with its sample
    import tarfile

    names = set()
    for p in new:
        with tarfile.open(p) as tf:
            names |= {m.name for m in tf.getmembers()}
    md = {n for n in names if n.endswith(".md")}
    assert len(md) == 2
    assert any(n.endswith(".json") for n in names)  # a0.json preserved
    # re-keying contract: <md5(source shard)[:8]>-<key>.<slot>
    import hashlib

    pref_a = hashlib.md5(str(drop / "a.tar").encode()).hexdigest()[:8]
    assert f"{pref_a}-a0.md" in names

    # membership reflects the swap; a second repack is a no-op
    known = eng._shard_containers()
    assert str(drop / "a.tar") not in known
    assert all(p in known for p in new)
    rep2 = eng.repack_shards(str(drop), samples_per_shard=4)
    assert rep2["noop"]
    assert _titles(eng) == got


@pytest.mark.slow
def test_repack_crash_windows_converge(spark, tmp_path, monkeypatch):
    """Crash injection at every repack protocol window; the NEXT entry
    point (repack or a routine sync) must converge to the same served
    state with no duplicates and no lost samples."""
    import mcp_local_rag_spark.plans.repack as repack_mod
    from mcp_local_rag_spark.plans.ingest import delete_documents
    from mcp_local_rag_spark.plans.repack import read_repack_intent

    def boom(msg):
        def _raise(*a, **k):
            raise RuntimeError(f"crash:{msg}")

        return _raise

    for window in ("stage", "fileops", "postclear"):
        drop = tmp_path / f"drop_{window}"
        drop.mkdir()
        _mk_shard(drop / "a.tar", [f"a{i}" for i in range(4)])
        _mk_shard(drop / "b.tar", [f"b{i}" for i in range(4)])
        eng = RagEngine(spark, str(tmp_path / f"table_{window}"))
        eng.sync_shards(str(drop))
        dead = [
            r.filePath
            for r in eng.chunks()
            .filter(F.col("filePath").rlike("#(a[123]|b[123])\\.md$"))
            .select("filePath").distinct().collect()
        ]
        delete_documents(spark, eng.table_path, dead)
        eng.recover_indexes()

        if window == "stage":
            # crash DURING staging, before the intent exists
            monkeypatch.setattr(
                repack_mod, "export_webdataset_shards", boom("stage"),
                raising=False,
            )
            import mcp_local_rag_spark.plans.export as export_mod

            monkeypatch.setattr(
                export_mod, "export_webdataset_shards", boom("stage")
            )
        elif window == "fileops":
            monkeypatch.setattr(repack_mod, "_apply_file_ops", boom("fileops"))
        elif window == "postclear":
            # crash after file ops + marker clear, before the sync
            real_unlink = os.unlink

            def unlink_then_boom(p, *a, **k):
                real_unlink(p, *a, **k)
                if str(p).endswith(repack_mod.INTENT_FILE):
                    raise RuntimeError("crash:postclear")

            monkeypatch.setattr(repack_mod.os, "unlink", unlink_then_boom)

        with pytest.raises(RuntimeError, match="crash:"):
            eng.repack_shards(str(drop), samples_per_shard=4)
        monkeypatch.undo()

        if window == "stage":
            # no intent was published; the directory is untouched
            assert read_repack_intent(eng.table_path) is None
            assert (drop / "a.tar").exists() and (drop / "b.tar").exists()
        if window == "fileops":
            # intent holds; a ROUTINE sync must complete the file ops
            # first (the half-applied race) and converge
            assert read_repack_intent(eng.table_path) is not None
            eng.sync_shards(str(drop))
            assert read_repack_intent(eng.table_path) is None
        else:
            # re-entering repack recovers/no-ops; state converges
            eng.repack_shards(str(drop), samples_per_shard=4)
        assert read_repack_intent(eng.table_path) is None

        # convergent final state, identical across every crash window:
        # the two live samples served exactly once from repacked shards
        rows = eng.chunks().select("filePath", "chunkIndex").collect()
        keys = [(r.filePath, r.chunkIndex) for r in rows]
        assert len(keys) == len(set(keys)), window
        assert _titles(eng) == {"a0", "b0"}, window
        assert not (drop / "a.tar").exists(), window
        assert not (drop / "b.tar").exists(), window
        tars = sorted(os.path.basename(p) for p in glob.glob(str(drop / "*.tar")))
        assert tars and all(t.startswith("repack-") for t in tars), window


# slow (verify-window, r16): corrupt-shard handling stays default-covered by test_stream_survives_corrupt_shard
@pytest.mark.slow
def test_repack_skips_disk_corrupted_shards(spark, tmp_path):
    """A shard that registered clean but was corrupted on disk afterwards
    must neither crash the repack nor leak its __corrupt__ marker row
    into an output shard — it keeps its stored rows and stays out of the
    candidate set (sync_shards' parse-before-delete posture)."""
    from mcp_local_rag_spark.plans.ingest import delete_documents

    drop = tmp_path / "drop"
    drop.mkdir()
    _mk_shard(drop / "a.tar", [f"a{i}" for i in range(4)])
    _mk_shard(drop / "b.tar", [f"b{i}" for i in range(4)])
    eng = RagEngine(spark, str(tmp_path / "table"))
    eng.sync_shards(str(drop))

    # curate most of both shards, then corrupt b ON DISK
    dead = [
        r.filePath
        for r in eng.chunks()
        .filter(F.col("filePath").rlike("#(a[123]|b[123])\\.md$"))
        .select("filePath").distinct().collect()
    ]
    delete_documents(spark, eng.table_path, dead)
    eng.recover_indexes()
    (drop / "b.tar").write_bytes(b"\x00garbage" * 64 + b"\xff" * 512)

    rep = eng.repack_shards(str(drop), samples_per_shard=4)
    # only a repacked; b (corrupt) untouched on disk, rows kept
    assert [os.path.basename(p) for p in rep["candidates"]] == ["a.tar"]
    assert (drop / "b.tar").exists()
    assert not (drop / "a.tar").exists()
    got = _titles(eng)
    assert got == {"a0", "b0"}
    import tarfile

    for p in rep["new_shards"]:
        with tarfile.open(p) as tf:
            assert all("__corrupt__" not in m.name for m in tf.getmembers())


# slow (verify-window, r16): sample-preservation stays default-covered by test_repack_merges_sparse_shards_and_preserves_content
@pytest.mark.slow
def test_repack_keeps_never_ingested_text_samples(spark, tmp_path):
    """r15 review: a text sample with NO table rows is only dropped when
    it was curated away. A sample that never ingested — its text is below
    the chunker's minimum gate, so ingest produced zero chunks for it —
    must travel into the repacked shard, mirroring sync_shards' contract
    that zero-chunk outcomes never destroy source bytes."""
    drop = tmp_path / "drop"
    drop.mkdir()
    # a.tar: 5 normal samples + 1 below-gate sample (registered because
    # the shard as a whole produced chunks); b.tar: 4 normal samples
    members = [(f"a{i}.md", (f"# a{i}\n\n" + BODY).encode()) for i in range(5)]
    members.append(("tiny.md", b"hi"))  # below MIN_CHUNK_LENGTH
    (drop / "a.tar").write_bytes(write_tar_shard(members))
    _mk_shard(drop / "b.tar", [f"b{i}" for i in range(4)])
    eng = RagEngine(spark, str(tmp_path / "table"))
    eng.sync_shards(str(drop))
    assert _titles(eng) == {f"a{i}" for i in range(5)} | {
        f"b{i}" for i in range(4)
    }

    # curate away a1..a4 and b1..b3 -> both shards sparse even with the
    # kept-back tiny sample (a: 2/6 = 0.33 < 0.5, b: 1/4)
    from mcp_local_rag_spark.plans.ingest import delete_documents

    dead = [
        r.filePath
        for r in eng.chunks()
        .filter(F.col("filePath").rlike("#(a[1234]|b[123])\\.md$"))
        .select("filePath").distinct().collect()
    ]
    assert len(dead) == 7
    delete_documents(spark, eng.table_path, dead)
    eng.recover_indexes()

    rep = eng.repack_shards(str(drop), samples_per_shard=4)
    assert not rep["noop"]
    # kept: a0 + b0 (live) + tiny (unproducible, never ingested)
    assert rep["samples_kept"] == 3 and rep["samples_dropped"] == 7
    import tarfile

    names = set()
    for p in rep["new_shards"]:
        with tarfile.open(p) as tf:
            names |= {m.name for m in tf.getmembers()}
    assert any(n.endswith("-tiny.md") for n in names), names
    # the kept-back sample's bytes are intact in the new shard
    for p in rep["new_shards"]:
        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                if m.name.endswith("-tiny.md"):
                    assert tf.extractfile(m).read() == b"hi"
    # served state unchanged: tiny never had rows, still has none
    assert _titles(eng) == {"a0", "b0"}


# slow (verify-window, r16): repack core stays default-covered by test_repack_merges_sparse_shards_and_preserves_content; the rowless edge is storm-depth
@pytest.mark.slow
def test_repack_excludes_wholly_rowless_shards(spark, tmp_path):
    """r15 review: a registered shard with text members but ZERO live
    rows is indistinguishable from a crashed streaming micro-batch whose
    checkpoint replay still needs the tar — excluded from candidacy by
    default (reported), reclaimed only under reclaim_rowless=True."""
    drop = tmp_path / "drop"
    drop.mkdir()
    _mk_shard(drop / "a.tar", [f"a{i}" for i in range(4)])
    _mk_shard(drop / "b.tar", [f"b{i}" for i in range(4)])
    eng = RagEngine(spark, str(tmp_path / "table"))
    eng.sync_shards(str(drop))

    # curate away ALL of a (fully rowless) and most of b
    from mcp_local_rag_spark.plans.ingest import delete_documents

    dead = [
        r.filePath
        for r in eng.chunks()
        .filter(F.col("filePath").rlike("#(a[0123]|b[123])\\.md$"))
        .select("filePath").distinct().collect()
    ]
    delete_documents(spark, eng.table_path, dead)
    eng.recover_indexes()

    rep = eng.repack_shards(str(drop), samples_per_shard=4)
    # a.tar skipped (rowless), untouched on disk; b.tar repacked alone
    assert [os.path.basename(p) for p in rep["skipped_rowless"]] == ["a.tar"]
    assert [os.path.basename(p) for p in rep["candidates"]] == ["b.tar"]
    assert (drop / "a.tar").exists() and not (drop / "b.tar").exists()
    assert _titles(eng) == {"b0"}

    # the caller vouches (no watcher mid-flight): a.tar reclaims fully
    rep2 = eng.repack_shards(
        str(drop), samples_per_shard=4, reclaim_rowless=True
    )
    assert str(drop / "a.tar") in rep2["candidates"]
    assert not (drop / "a.tar").exists()
    assert _titles(eng) == {"b0"}


def test_repack_torn_intent_marker_raises_with_guidance(spark, tmp_path):
    """A torn repack marker has no safe automatic fallback (the marker is
    the only record of which file ops may be half-applied) — reads must
    raise with operator guidance, not guess or crash obscurely."""
    from mcp_local_rag_spark.plans.repack import read_repack_intent

    table = tmp_path / "table"
    table.mkdir()
    (table / "_repack_intent.json").write_text("{\"shard_dir\": tru")
    with pytest.raises(RuntimeError, match="repack intent marker unreadable"):
        read_repack_intent(str(table))
