"""Neighbor-frame read (reference W5, src/vectordb/index.ts:138-164 and
src/server/index.ts:1034-1039): chunks of one document with
chunkIndex in [target-before, target+after], clamped at 0, sorted ascending.

With the chunks table partitioned by filePath hash bucket (plans/ingest.py)
this is a single-partition pruned scan — the Spark analogue of the
reference's <100 ms P95 neighbor lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BEFORE = 2  # reference src/server/tool-input.ts:186-213
DEFAULT_AFTER = 2
MAX_SPAN = 50


def read_neighbors(
    chunks: DataFrame,
    file_path: str,
    target: int,
    *,
    before: int = DEFAULT_BEFORE,
    after: int = DEFAULT_AFTER,
) -> DataFrame:
    before = min(max(before, 0), MAX_SPAN)
    after = min(max(after, 0), MAX_SPAN)
    lo = max(target - before, 0)
    hi = target + after
    df = chunks
    if "bucket" in chunks.columns:
        # partition pruning: only the document's hash bucket is scanned
        from ..plans.ingest import N_BUCKETS

        b = F.pmod(F.xxhash64(F.lit(file_path)), F.lit(N_BUCKETS)).cast("int")
        df = df.filter(F.col("bucket") == b)
    return (
        df.filter(
            (F.col("filePath") == file_path) & F.col("chunkIndex").between(lo, hi)
        )
        .orderBy("chunkIndex")
    )
