"""Catalog-registered bucketed tables — co-located joins with NO shuffle.

``write_chunks`` lays files out in hash-bucket directories, which gives
partition pruning but Spark's planner cannot prove co-location from a
directory layout alone. Registering the same data with ``bucketBy``
through the catalog attaches the bucketing metadata Catalyst needs to
drop BOTH shuffles from chunks<->postings / chunks<->chunks joins on
filePath — at 100 TB this is the difference between a join that moves
the corpus and one that moves nothing.

Spark requires saveAsTable for bucketBy (bucket metadata lives in the
catalog); the default in-memory catalog + spark-warehouse dir works
without Hive. Sort columns make merge-friendly buckets and give
row-group pruning inside each bucket.

When the join keys are a SUPERSET of the bucket key (filePath,
chunkIndex over filePath buckets), set
``spark.sql.requireAllClusterKeysForCoPartition=false`` — co-partition
on the subset is exactly what document-aligned bucketing guarantees.
Gated in tests/test_plans.py::test_bucketed_tables_join_without_shuffle
(SortMergeJoin with zero Exchange operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .ingest import N_BUCKETS


def save_bucketed(
    df: DataFrame,
    table_name: str,
    *,
    bucket_col: str = "filePath",
    sort_cols: tuple[str, ...] = ("filePath", "chunkIndex"),
    n_buckets: int = N_BUCKETS,
    mode: str = "overwrite",
) -> None:
    """Register ``df`` as a bucketed+sorted catalog table."""
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .mode(mode)
        .format("parquet")
        .saveAsTable(table_name)
    )


def cogrouped_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on (a superset of) the bucket
    column: with matching bucket specs the planner emits a SortMergeJoin
    with ZERO Exchange operators (gated in tests/test_plans.py).

    The helper sets ``requireAllClusterKeysForCoPartition=false`` itself:
    join keys that are a SUPERSET of the bucket key (the documented use)
    would otherwise silently re-shuffle both sides, losing the entire
    point of the bucketing — relying on the caller to remember a session
    conf is exactly the failure mode this wrapper exists to remove."""
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    return spark.table(left_table).join(spark.table(right_table), on, how)
