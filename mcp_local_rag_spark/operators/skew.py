"""Skew-mitigation utilities for hot keys at scale.

AQE's skew-join splitting (on in session.py) covers joins; these helpers
cover the remaining hot spots:

  * salted two-phase aggregation — a groupBy on a key where a handful of
    values dominate (one document with millions of chunks, one LSH bucket
    holding half the corpus) shuffles all hot-key rows to one task. Salting
    fans the partial aggregate across ``n_salts`` tasks, then combines.
  * capped LSH buckets — a degenerate MinHash band bucket (e.g. the empty
    document) produces O(b²) candidate pairs; cap the bucket size and
    report what was dropped rather than letting one bucket dominate the
    pair join (no silent truncation: dropped buckets are returned).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    *,
    n_salts: int = 16,
    agg_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Two-phase (salted partial, then final) aggregation for skewed keys.

    Default computes count(*); pass ``agg_cols`` as {name: partial-agg
    expression} for sums (algebraic aggregates only — each must combine by
    summation)."""
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(n_salts)))
    partial_aggs = [F.count("*").alias("_pc")] + [
        expr.alias(f"_p_{name}") for name, expr in (agg_cols or {}).items()
    ]
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum("_pc").alias("n")] + [
        F.sum(f"_p_{name}").alias(name) for name in (agg_cols or {})
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def cap_bucket_size(
    bands: DataFrame,
    *,
    bucket_cols: Sequence[str] = ("band", "band_key"),
    id_col: str = "doc_id",
    max_bucket: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Split banded LSH rows into (kept, dropped_buckets).

    ``dropped_buckets`` lists each over-limit bucket with its size so the
    caller can log coverage loss instead of silently skewing or exploding
    the pair join (a bucket of b docs yields b*(b-1)/2 pairs)."""
    sizes = bands.groupBy(*bucket_cols).agg(F.count("*").alias("bucket_size"))
    kept = bands.join(
        sizes.filter(F.col("bucket_size") <= max_bucket).select(*bucket_cols),
        list(bucket_cols),
        "left_semi",
    )
    dropped = sizes.filter(F.col("bucket_size") > max_bucket)
    return kept, dropped
