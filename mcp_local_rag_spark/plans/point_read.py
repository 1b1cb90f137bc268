"""Serving-path point reads over snapshot tables — no Spark job.

plans/merge.key_lookup is the in-plan (batch) form of a point read: it
prunes to one bucket directory, but still pays Spark's job-submission
floor (~100-200 ms) per read. This module is the NeighborServer pattern
(operators/neighbors.py, 2-5 ms reads) applied to snapshot-versioned
tables: the manifest is resolved driver-locally (JSON), the bucket is
routed with the bit-exact xxhash64 mirror (functions/spark_hash), and
the one bucket directory is read through a cached pyarrow dataset with
a typed predicate — row-group min/max stats prune inside the key-sorted
files exactly as they do for the Spark plan.

BASELINE.json's architecture note — "Batch index build via DataFrame
ops, serving requires external system" — this is that system for the
warehouse layer: same files, same manifests, same time-travel surface,
no extra infrastructure.

Scale posture: a lookup touches one manifest (O(n_buckets) JSON,
cached per immutable version), one directory listing (cached per
immutable data dir), and the row groups whose stats admit the key.
Nothing rides table size.
"""

from __future__ import annotations

import os
from typing import Any

from ..functions.spark_hash import bucket_of, spark_string_of
from .merge import (
    _dir_version,
    current_version,
    file_column_of,
    read_manifest,
)

def _coerce_arrow(value, arrow_type):
    """``value`` as the python type pyarrow needs to compare against a
    column of ``arrow_type`` without casting the column — typed from the
    file schema itself, so the reader never trusts (possibly older)
    manifest metadata for filter typing."""
    import pyarrow.types as pt

    if pt.is_integer(arrow_type):
        return int(value)
    if pt.is_floating(arrow_type):
        return float(value)
    if pt.is_boolean(arrow_type):
        if isinstance(value, bool):
            return value
        return str(value).lower() == "true"
    if pt.is_string(arrow_type) or pt.is_large_string(arrow_type):
        return value if isinstance(value, str) else spark_string_of(value)
    return value


class SnapshotReader:
    """Point reads (primary key -> rows) over one snapshot table.

    Handles are cached per immutable artifact: manifests by version,
    pyarrow datasets by data dir. The CURRENT pointer is re-read per
    lookup (one tiny file) so a reader stays fresh across commits
    without invalidation; ``invalidate()`` exists for vacuum (which
    deletes retired dirs a cached handle may reference)."""

    def __init__(self, table_path: str):
        self._path = table_path
        self._manifests: dict[int, dict] = {}
        self._datasets: dict[tuple[str, int], object] = {}

    def invalidate(self) -> None:
        self._manifests.clear()
        self._datasets.clear()

    def _manifest(self, version: int | None) -> dict:
        if version is None:
            version = current_version(self._path)
        if version not in self._manifests:
            self._manifests[version] = read_manifest(self._path, version)
        return self._manifests[version]

    def _dataset(self, data_dir: str, bucket: int):
        key = (data_dir, bucket)
        if key not in self._datasets:
            import pyarrow.dataset as ds

            self._datasets[key] = ds.dataset(
                os.path.join(self._path, data_dir, f"bucket={bucket}"),
                format="parquet",
            )
        return self._datasets[key]

    def lookup(
        self,
        key_value,
        *,
        version: int | None = None,
        columns: list[str] | None = None,
    ) -> list[dict[str, Any]]:
        """Rows whose primary key equals ``key_value``, as dicts in the
        manifest-recorded column order — null-filled for columns a
        pre-schema-evolution bucket file lacks, so the shape never
        depends on which bucket the key hashed into (key_lookup's
        contract)."""
        import pyarrow.dataset as ds

        manifest = self._manifest(version)
        key, nb = manifest["key"], manifest["n_buckets"]
        out_cols = columns or list(
            manifest.get("columns") or self._schema_cols(manifest)
        )
        b = bucket_of(spark_string_of(key_value), nb)
        data_dir = manifest["buckets"].get(str(b))
        if data_dir is None:
            return []
        dset = self._dataset(data_dir, b)
        # map current names to the dir's FILE-era names through the
        # manifest's schema log (rename/drop are metadata-only; old
        # files keep old names). None = lineage absent then -> NULL.
        log = manifest.get("schema_log", [])
        dirv = _dir_version(data_dir)
        fmap = {c: file_column_of(c, dirv, log) for c in out_cols}
        key_file = file_column_of(key, dirv, log) or key
        present = {
            c: fc
            for c, fc in fmap.items()
            if fc is not None and fc in dset.schema.names
        }
        typed = _coerce_arrow(key_value, dset.schema.field(key_file).type)
        tbl = dset.to_table(
            columns=sorted(set(present.values())),
            filter=ds.field(key_file) == typed,
        )
        rows = tbl.to_pylist()
        return [
            {c: (r[present[c]] if c in present else None) for c in out_cols}
            for r in rows
        ]

    def lookup_many(
        self,
        key_values: list,
        *,
        version: int | None = None,
        columns: list[str] | None = None,
    ) -> list[dict[str, Any]]:
        """Batch point read: one dataset filter per touched bucket."""
        import pyarrow.dataset as ds

        manifest = self._manifest(version)
        key, nb = manifest["key"], manifest["n_buckets"]
        out_cols = columns or list(
            manifest.get("columns") or self._schema_cols(manifest)
        )
        by_bucket: dict[int, list] = {}
        for v in key_values:
            by_bucket.setdefault(
                bucket_of(spark_string_of(v), nb), []
            ).append(v)
        log = manifest.get("schema_log", [])
        rows: list[dict] = []
        for b, vals in sorted(by_bucket.items()):
            data_dir = manifest["buckets"].get(str(b))
            if data_dir is None:
                continue
            dset = self._dataset(data_dir, b)
            dirv = _dir_version(data_dir)
            fmap = {c: file_column_of(c, dirv, log) for c in out_cols}
            key_file = file_column_of(key, dirv, log) or key
            present = {
                c: fc
                for c, fc in fmap.items()
                if fc is not None and fc in dset.schema.names
            }
            ktype = dset.schema.field(key_file).type
            got = dset.to_table(
                columns=sorted(set(present.values())),
                filter=ds.field(key_file).isin(
                    [_coerce_arrow(v, ktype) for v in vals]
                ),
            ).to_pylist()
            rows.extend(
                {
                    c: (r[present[c]] if c in present else None)
                    for c in out_cols
                }
                for r in got
            )
        return rows

    def _schema_cols(self, manifest: dict) -> list[str]:
        # pre-"columns" manifests: derive from the v1 anchor dir's schema
        import pyarrow.dataset as ds

        anchor = ds.dataset(
            os.path.join(self._path, "data_v1"), format="parquet",
            partitioning="hive",
        )
        return [n for n in anchor.schema.names if n != "bucket"]


class SecondaryReader:
    """Serving-path non-key lookup: value -> source rows through a
    sharded secondary index (plans/secondary), all pyarrow. The index's
    S candidate state keys are computed locally (ivm_key_of), their
    posting maps read from the index's bucket dirs, and the pks fanned
    into SnapshotReader.lookup_many on the source.

    Serving reads are for SELECTIVE values (a dashboard fetching one
    entity's rows); ``cap`` bounds the pk materialization and raises
    past it — the skewed-value path belongs to the distributed plan
    (plans/secondary.lookup_by), not a sidecar."""

    def __init__(self, index_path: str, source_table: str | None = None):
        from .changefeed import load_view_spec

        self._index_path = index_path
        spec = load_view_spec(index_path)
        if "secondary" not in spec:
            raise ValueError(
                f"{index_path} is not a sharded secondary index"
            )
        self._sec = spec["secondary"]
        self._cols = self._sec["cols"]
        self._src = source_table or spec["source_table"]
        self._index = SnapshotReader(index_path)
        self._source = SnapshotReader(self._src)

    def invalidate(self) -> None:
        self._index.invalidate()
        self._source.invalidate()

    def _check_fresh(self) -> None:
        """THE freshness contract — plans/secondary._check_fresh itself,
        not a serving-side copy: a lagging index silently MISSES rows,
        so a serving read against a stale index raises unless the caller
        opted into as-of-the-cursor semantics. Driver-local metadata
        only (two tiny JSON reads, uncached: freshness must see the
        latest commit)."""
        from .secondary import _check_fresh

        _check_fresh(self._index_path, self._src)

    def _resolve_versions(
        self, stale_ok: bool, at_source_version: int | None
    ) -> tuple[int, int]:
        """(index version, source version) for one serving lookup —
        PINNED up front in every mode (plans/secondary's
        _resolve_idx_version contract): a commit landing mid-lookup must
        never make the freshness check, the posting read, and the source
        read see three different instants. AS-OF resolves the index
        version by its recorded changefeed cursor — the same
        metadata-only walk as the in-plan lanes."""
        if at_source_version is not None:
            from .secondary import _index_version_for_source

            return (
                _index_version_for_source(
                    self._index_path, at_source_version
                ),
                at_source_version,
            )
        if not stale_ok:
            self._check_fresh()
        return (
            current_version(self._index_path),
            current_version(self._src),
        )

    def lookup_by(
        self,
        value,
        *,
        columns: list[str] | None = None,
        cap: int = 10_000,
        stale_ok: bool = False,
        at_source_version: int | None = None,
    ) -> list[dict[str, Any]]:
        import pyarrow.dataset as ds

        from .ivm import ivm_key_of

        vals = tuple(value) if isinstance(value, (tuple, list)) else (value,)
        if len(vals) != len(self._cols):
            raise ValueError(
                f"index keys {self._cols} need {len(self._cols)} value(s)"
            )
        idx_version, src_version = self._resolve_versions(
            stale_ok, at_source_version
        )
        shards = self._sec["pk_shards"]
        manifest = self._index._manifest(idx_version)
        nb = manifest["n_buckets"]
        keys = [ivm_key_of([*vals, s]) for s in range(shards)]
        by_bucket: dict[int, list[str]] = {}
        for k in keys:
            by_bucket.setdefault(bucket_of(k, nb), []).append(k)
        pks: list[str] = []
        for b, ks in sorted(by_bucket.items()):
            data_dir = manifest["buckets"].get(str(b))
            if data_dir is None:
                continue
            tbl = self._index._dataset(data_dir, b).to_table(
                columns=["_pks"],
                filter=ds.field("_ivm_key").isin(ks),
            )
            for m in tbl.column("_pks").to_pylist():
                if m:
                    pks.extend(k for k, _ in m)
            if len(pks) > cap:
                raise ValueError(
                    f"value {vals!r} has > {cap} matching rows — a "
                    "serving point read is for selective values; use "
                    "plans.secondary.lookup_by (distributed) instead"
                )
        if not pks:
            return []
        # posting-map keys are the pk's STRING cast; lookup_many types
        # them back from the source file schema itself
        return self._source.lookup_many(
            sorted(set(pks)), columns=columns, version=src_version
        )

    def range_lookup(
        self,
        lo,
        hi,
        *,
        inclusive: bool = True,
        columns: list[str] | None = None,
        cap: int = 10_000,
        stale_ok: bool = False,
        at_source_version: int | None = None,
    ) -> list[dict[str, Any]]:
        """Serving twin of plans/secondary.range_lookup: source rows whose
        (single-column) indexed value lies in [lo, hi] ([lo, hi) with
        ``inclusive=False``). A range admits no candidate-key enumeration,
        so the index is scanned with the range pushed as a pyarrow
        predicate — correct at serving latency because the index is
        O(distinct values x S) rows, orders of magnitude smaller than the
        source; the SOURCE read stays a bounded lookup_many over the
        matching posting maps' pks. ``cap`` bounds the pk fan-out exactly
        as lookup_by does — wide ranges belong to the distributed plan."""
        import pyarrow.dataset as ds

        if len(self._cols) != 1:
            raise ValueError(
                f"range_lookup needs a single-column index, got keys "
                f"{self._cols}"
            )
        idx_version, src_version = self._resolve_versions(
            stale_ok, at_source_version
        )
        col = self._cols[0]
        manifest = self._index._manifest(idx_version)
        pks: list[str] = []
        for b in sorted(int(k) for k in manifest["buckets"]):
            data_dir = manifest["buckets"].get(str(b))
            if data_dir is None:
                continue
            dset = self._index._dataset(data_dir, b)
            ctype = dset.schema.field(col).type
            f_lo = ds.field(col) >= _coerce_arrow(lo, ctype)
            f_hi = (
                ds.field(col) <= _coerce_arrow(hi, ctype)
                if inclusive
                else ds.field(col) < _coerce_arrow(hi, ctype)
            )
            tbl = dset.to_table(columns=["_pks"], filter=f_lo & f_hi)
            for m in tbl.column("_pks").to_pylist():
                if m:
                    pks.extend(k for k, _ in m)
            if len(pks) > cap:
                raise ValueError(
                    f"range [{lo!r}, {hi!r}] has > {cap} matching rows — "
                    "a serving range read is for selective ranges; use "
                    "plans.secondary.range_lookup (distributed) instead"
                )
        if not pks:
            return []
        return self._source.lookup_many(
            sorted(set(pks)), columns=columns, version=src_version
        )
