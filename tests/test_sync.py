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
