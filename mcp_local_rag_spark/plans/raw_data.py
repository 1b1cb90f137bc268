"""Raw-data identity + sink (reference S10,
src/utils/raw-data-utils.ts:20-44, 106-141, 196-214).

``ingest_data`` content (not backed by a file) is persisted under
``<db>/raw-data/<base64url(normalized_source)>.md`` with a sidecar meta
record; the source is recoverable from the path. Here the sidecar is a
small parquet side table instead of per-file .meta.json — same facts,
queryable shape.
"""

from __future__ import annotations

import base64
import os
from urllib.parse import urlsplit, urlunsplit

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.paths import base64url_decode, base64url_encode


def normalize_source(source: str) -> str:
    """Strip query+fragment from http(s) URLs ONLY (reference
    src/utils/raw-data-utils.ts:57-70); other sources pass through."""
    if source.startswith(("http://", "https://")):
        parts = urlsplit(source)
        return urlunsplit((parts.scheme, parts.netloc, parts.path, "", ""))
    return source


def source_to_path(source: str, db_path: str = "/data/db") -> str:
    key = base64.urlsafe_b64encode(normalize_source(source).encode()).decode().rstrip("=")
    return f"{db_path.rstrip('/')}/raw-data/{key}.md"


def path_to_source(path: str, db_path: str = "/data/db") -> str | None:
    """Inverse of source_to_path; None for non-raw-data paths.

    Membership is the MANAGED DIRECTORY, not decodability: an ordinary
    document whose basename happens to be valid base64url (e.g.
    '/docs/dGVzdA.md') must not be misreported as a raw-data row (the
    column-level twin, restore_sources, applies the same prefix guard)."""
    if not path.startswith(db_path.rstrip("/") + "/raw-data/"):
        return None
    name = os.path.basename(path)
    if not name.endswith(".md"):
        return None
    key = name[: -len(".md")]
    try:
        padded = key + "=" * (-len(key) % 4)
        return base64.urlsafe_b64decode(padded.encode()).decode()
    except Exception:
        return None


def restore_sources(df: DataFrame, path_col: str = "filePath", db_path: str = "/data/db") -> DataFrame:
    """Column-level source restoration for result shaping (reference
    src/server/index.ts:480-497): raw-data rows get a `source` column."""
    prefix = db_path.rstrip("/") + "/raw-data/"
    key = F.regexp_extract(F.col(path_col), r"/raw-data/(.+)\.md$", 1)
    # length(key) > 0 guard: a stray non-.md path under the prefix
    # extracts '' and would decode to source='' — the python twin
    # (path_to_source) returns None for it, and downstream IS NOT NULL
    # checks must agree
    return df.withColumn(
        "source",
        F.when(
            F.col(path_col).startswith(prefix) & (F.length(key) > 0),
            base64url_decode(key),
        ).otherwise(F.lit(None).cast("string")),
    )


def raw_data_side_table(
    spark: SparkSession, records: list[dict], db_path: str = "/data/db"
) -> DataFrame:
    """(source, title, format, content) -> sidecar rows with managed paths."""
    rows = [
        (
            r["source"],
            normalize_source(r["source"]),
            source_to_path(r["source"], db_path),
            r.get("title"),
            r.get("format", "markdown"),
            r["content"],
        )
        for r in records
    ]
    return spark.createDataFrame(
        rows,
        "source string, normalized_source string, filePath string,"
        " title string, format string, content string",
    )


def roundtrip_check_expr(path_col="filePath"):
    """Spark expression asserting path->source->path identity (test hook)."""
    key = F.regexp_extract(F.col(path_col), r"/raw-data/(.+)\.md$", 1)
    return base64url_encode(base64url_decode(key)) == key
