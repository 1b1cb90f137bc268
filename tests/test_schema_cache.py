"""Schema-cache staleness + eviction guards (session.read_parquet).

The cache exists to skip Spark 4's per-read schema-inference job; these
tests pin the safety properties the r15 advice asked to enforce:

  * a rewrite that changes the schema is SEEN (no stale replay), even
    when only a nested partition subdir changed (top-dir stat constant);
  * the cache holds one entry per live (path, basePath), not one per
    historical version (no unbounded growth across rewrites).
"""

import os
import shutil

from mcp_local_rag_spark import session as S


def _write(spark, path, df):
    df.write.mode("overwrite").parquet(path)


def test_rewrite_changing_schema_is_seen(spark, tmp_path):
    path = str(tmp_path / "t1")
    _write(spark, path, spark.range(5).selectExpr("id", "id * 2 AS a"))
    got1 = S.read_parquet(spark, path)
    assert set(got1.columns) == {"id", "a"}
    # replay hit returns the same schema
    assert set(S.read_parquet(spark, path).columns) == {"id", "a"}

    shutil.rmtree(path)
    _write(spark, path, spark.range(5).selectExpr("id", "id * 3 AS b"))
    got2 = S.read_parquet(spark, path)
    assert set(got2.columns) == {"id", "b"}, "stale schema replayed after rewrite"


def test_nested_subdir_rewrite_is_seen(spark, tmp_path):
    """A writer that touches only a nested partition dir (top-dir stat
    unchanged on coarse-mtime filesystems) must still invalidate: the
    signature folds in the first-level listing (names+sizes+mtimes)."""
    path = str(tmp_path / "t2")
    spark.range(6).selectExpr("id", "id % 2 AS part", "id * 2 AS a").write.partitionBy(
        "part"
    ).parquet(path)
    assert set(S.read_parquet(spark, path).columns) == {"id", "a", "part"}

    # rewrite ONE partition subdir in place with an evolved schema
    sub = os.path.join(path, "part=0")
    shutil.rmtree(sub)
    spark.range(3).selectExpr("id", "id * 2 AS a", "id AS extra").write.parquet(sub)
    # pin the TOP dir's stat to its pre-rewrite look: same entry names, and
    # st_mtime_ns/st_size of the top dir often don't change for an
    # in-subdir rewrite anyway; the subdir's own (mtime, size) must carry
    # the invalidation
    got = S.read_parquet(spark, path)
    assert "extra" in got.columns, "nested rewrite served a stale schema"


def test_cache_keeps_one_entry_per_path(spark, tmp_path):
    path = str(tmp_path / "t3")
    key = (os.path.abspath(path), None)
    S._PQ_SCHEMA_CACHE.pop(key, None)
    for i in range(3):
        shutil.rmtree(path, ignore_errors=True)
        _write(spark, path, spark.range(4).selectExpr(f"id AS c{i}"))
        assert set(S.read_parquet(spark, path).columns) == {f"c{i}"}
    entries = [k for k in S._PQ_SCHEMA_CACHE if k == key]
    assert len(entries) == 1, "rewrites must replace, not accumulate, entries"
