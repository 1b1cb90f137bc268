"""Directory source (reference S5, src/utils/scan.ts:220-290).

Reference semantics: bounded BFS (depth <= 10 from each root), symlinks
skipped and RECORDED, unreadable dirs recorded, exclude-prefix filtering,
scope pushdown into the traversal. The coverage facts are data — they gate
prune decisions in the sync planner (§2.7), so the scanner returns them.

The listing itself is driver-side (file metadata, not data-plane); the
file CONTENT read is the distributed part — ``read_files`` hands the
listing to Spark's binaryFile source, so bytes are read by executors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .structured import COMPRESSION_EXTS

MAX_DEPTH = 10  # reference src/utils/limits.ts:9
MAX_FILE_SIZE = 100 * 1024 * 1024  # reference src/utils/limits.ts:15-21
SUPPORTED_EXTENSIONS = {".md", ".txt", ".pdf", ".docx"}  # src/parser/index.ts:31


@dataclass
class ScanResult:
    files: list[dict] = field(default_factory=list)  # path, size, realpath
    skipped_symlinks: list[str] = field(default_factory=list)
    unreadable_dirs: list[str] = field(default_factory=list)
    depth_limited_dirs: list[str] = field(default_factory=list)
    oversized_files: list[str] = field(default_factory=list)

    @property
    def unobserved_prefixes(self) -> list[str]:
        """Regions the scan could not observe — prune must be withheld under
        these (reference src/features/sync.ts:301-316)."""
        return (
            self.unreadable_dirs
            + self.depth_limited_dirs
            + self.skipped_symlinks
            + self.oversized_files
        )


def scan_directory(
    root: str,
    *,
    max_depth: int = MAX_DEPTH,
    exclude_prefixes: tuple[str, ...] = (),
    extensions: set[str] | None = None,
    max_file_size: int = MAX_FILE_SIZE,
) -> ScanResult:
    """Bounded BFS over one root, recording coverage facts."""
    extensions = extensions if extensions is not None else SUPPORTED_EXTENSIONS
    from collections import deque

    result = ScanResult()
    root = os.path.abspath(root)
    queue: deque[tuple[str, int]] = deque([(root, 0)])
    while queue:
        dirpath, depth = queue.popleft()
        if depth > max_depth:
            result.depth_limited_dirs.append(dirpath)
            continue
        try:
            entries = sorted(os.listdir(dirpath))
        except OSError:
            result.unreadable_dirs.append(dirpath)
            continue
        for name in entries:
            path = os.path.join(dirpath, name)
            if any(path == p or path.startswith(p.rstrip("/") + "/") for p in exclude_prefixes):
                continue
            if os.path.islink(path):
                result.skipped_symlinks.append(path)
                continue
            if os.path.isdir(path):
                queue.append((path, depth + 1))
                continue
            stem, ext = os.path.splitext(name)
            ext = ext.lower()
            if ext.lstrip(".") in COMPRESSION_EXTS:
                # one transparent envelope: a.md.gz scans as .md — the
                # parser strips the same suffix (structured.maybe_decompress,
                # output-capped), so discovery and dispatch stay consistent
                ext = os.path.splitext(stem)[1].lower()
            if ext not in extensions:
                continue
            try:
                size = os.path.getsize(path)
            except OSError:
                # deleted between listdir and stat, or unstatable — a
                # coverage fact like unreadable dirs, never a scan abort
                result.unreadable_dirs.append(path)
                continue
            if size > max_file_size:
                result.oversized_files.append(path)
                continue
            result.files.append(
                {"path": path, "size": size, "realpath": os.path.realpath(path)}
            )
    return result


def read_files(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed content read of a scanned listing: (path, length, content).

    binaryFile gives executor-side reads with automatic splitting across the
    cluster; column pruning drops `content` for metadata-only consumers.
    """
    if not paths:
        from pyspark.sql.types import (
            BinaryType, LongType, StringType, StructField, StructType,
        )

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("path", StringType()),
                    StructField("length", LongType()),
                    StructField("content", BinaryType()),
                ]
            ),
        )
    df = spark.read.format("binaryFile").load(paths)
    # anchored scheme strip: replace() would also mangle a path whose NAME
    # contains 'file:' (e.g. '/data/my file:v1.txt')
    return df.selectExpr(
        "regexp_replace(path, '^file:', '') AS path", "length", "content"
    )
