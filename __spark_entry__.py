"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship hybrid vector+BM25 search on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) as paired
Spark-callable / DuckDB-oracle entries. Implementations live in
``mcp_local_rag_spark/``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mcp_local_rag_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mcp_local_rag_spark.queries.rag import q_hybrid_search

    return q_hybrid_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
