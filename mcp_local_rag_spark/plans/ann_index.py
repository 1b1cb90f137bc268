"""Persisted partition-pruned vector index (IVF layout).

The ANN twin of plans/fts.py's term-bucketed postings: corpus vectors are
stored partitioned by their coarse cell, so a query reads ONLY the probed
cells' directories — Spark partition pruning keeps the untouched cells'
files unopened (the scan shows the cell predicate under PartitionFilters,
not PushedFilters). At 100 TB with n_cells in the thousands and
nprobe ~ a few, per-query I/O is nprobe/n_cells of the corpus, which is
the entire point of IVF — and here the pruning is done by the storage
layout itself, with no index server.

Cell assignment is pluggable: MLlib KMeans labels
(operators/similarity.ivf_assign) for real deployments, or any
precomputed integer column when determinism across engines matters
(the oracle-paired query uses the corpus's own label column).
"""

from __future__ import annotations

import json
import os
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import read_parquet

from ..functions.vector import vec_lit

META_FILE = "_ann_meta.json"
CENTROIDS_FILE = "_centroids.parquet"
MAINT_LOCK_FILE = "._ivf_maint.lock"


def _maintenance_lock(path: str):
    """Serialize IVF maintenance per index: every verb that can observe
    or resolve a split marker takes an exclusive flock on
    ``._ivf_maint.lock`` for its whole critical section. Without it, a
    second maintenance pass (or a stats probe) overlapping a LIVE split
    would see the in-flight marker, "recover" it by rmtree-ing the
    half-written subcell dirs, and the live split would then commit a
    sidecar missing those rows — permanent loss. Under the lock, a
    marker observed on entry can only belong to a CRASHED split, so
    recovery needs no grace heuristics. Reentrant within a thread
    (ivf_maintain -> split_ivf_cell -> recover_ivf_splits); concurrent
    threads and processes queue on the flock."""
    from .locks import flock_dir

    return flock_dir(path, MAINT_LOCK_FILE, reentrant=True)


def _with_maintenance_lock(fn):
    """Run ``fn`` under the index's maintenance flock (the ``path``
    argument names the index)."""
    import functools
    import inspect

    sig = inspect.signature(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        bound = sig.bind(*args, **kwargs)
        with _maintenance_lock(bound.arguments["path"]):
            return fn(*args, **kwargs)

    return wrapper


def write_ivf_index(
    assigned: DataFrame,
    path: str,
    *,
    cell_col: str = "cell",
    sort_cols: tuple[str, ...] = (),
    meta: dict | None = None,
    vec_col: str | None = "embedding",
) -> None:
    """Write the cell-partitioned vector table plus a meta sidecar.

    ``assigned`` must carry ``cell_col`` (integer coarse-cell id); every
    other column is stored as-is. One write job regardless of cell count
    (partitionBy fans the files out, no per-cell driver loop). The
    repartition clusters each cell into one task before partitionBy —
    without it every input partition appends a file to every cell, the
    M*N small-file explosion (same discipline as plans/ingest.write_chunks).
    ``sort_cols`` (e.g. the vector id) adds an in-cell sort so parquet
    min/max stats serve point reads within a probed cell.
    """
    n_cells = assigned.select(cell_col).distinct().count()
    (
        assigned.repartition(max(int(n_cells), 1), cell_col)
        .sortWithinPartitions(cell_col, *sort_cols)
        .write.mode("overwrite")
        .partitionBy(cell_col)
        .parquet(path)
    )
    with open(os.path.join(path, META_FILE), "w") as f:
        json.dump({"cell_col": cell_col, **(meta or {})}, f)
    # per-cell centroids ride as a tiny sidecar (n_cells x dim rows) so a
    # SERVING process can pick probe cells without touching the corpus —
    # the IVF coarse quantizer is part of the index artifact, exactly like
    # the FTS stats sidecar (plans/fts). One grouped aggregate, map-side
    # combinable; skipped when the caller stores no vector column here.
    if vec_col is not None and vec_col in assigned.columns:
        _write_centroids(_cell_centroids(assigned, cell_col, vec_col), path)


def _cell_centroids(assigned: DataFrame, cell_col: str, vec_col: str):
    """(cell, centroid array, n) as a tiny pandas frame — one grouped
    aggregate, map-side combinable."""
    return (
        assigned.select(cell_col, F.posexplode(vec_col).alias("_d", "_x"))
        .groupBy(cell_col, "_d")
        .agg(F.avg("_x").alias("_m"), F.count("*").alias("_n"))
        .groupBy(cell_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("_d", "_m"))).alias("_dm"),
            F.max("_n").alias("n"),
        )
        .select(
            F.col(cell_col).alias("cell"),
            F.transform("_dm", lambda s: s["_m"]).alias("centroid"),
            "n",
        )
        .toPandas()
    )


def _write_centroids(cents, path: str) -> None:
    # tmp + rename: the sidecar is split_ivf_cell's COMMIT POINT, so a
    # torn write must be impossible — readers see the old complete file
    # or the new complete file, never a half-written footer
    import pyarrow as pa
    import pyarrow.parquet as pq

    final = os.path.join(path, CENTROIDS_FILE)
    tmp = os.path.join(path, f".{CENTROIDS_FILE}.tmp")
    pq.write_table(pa.Table.from_pandas(cents, preserve_index=False), tmp)
    os.replace(tmp, final)


@_with_maintenance_lock
def append_to_ivf_index(
    assigned: DataFrame,
    path: str,
    *,
    sort_cols: tuple[str, ...] = (),
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance — the IVF twin of plans/fts.
    refresh_postings' append lane: an arriving embedding batch lands in
    its cells' directories (one append job, cost ~ batch) and the
    centroid sidecar merges by WEIGHTED mean — (old_c*old_n +
    batch_sum) / (old_n + batch_n) per dimension, exactly the mean of the
    union — so the coarse quantizer stays the one a full rebuild would
    produce (up to float associativity; pytest bounds the drift).
    Serving processes observe the append at their next invalidate()
    (IvfVectorServer caches by cell, so only touched cells reload).

    Takes the index's maintenance flock (round 13): an append racing a
    split of the same cell would land rows in a directory the split is
    about to rmtree — permanent loss. Under the lock the append either
    precedes the split (the rows move with the rewrite) or follows it
    (the batch re-creates its assigned cell dir and the weighted sidecar
    merge re-registers the cell, so the rows stay probe-reachable)."""
    import numpy as np

    meta = read_index_meta(path)
    cell_col = meta["cell_col"]
    n_cells = assigned.select(cell_col).distinct().count()
    (
        assigned.repartition(max(int(n_cells), 1), cell_col)
        .sortWithinPartitions(cell_col, *sort_cols)
        .write.mode("append")
        .partitionBy(cell_col)
        .parquet(path)
    )
    if vec_col is None or vec_col not in assigned.columns:
        return
    batch = _cell_centroids(assigned, cell_col, vec_col)
    import pandas as pd
    import pyarrow.parquet as pq

    cent_path = os.path.join(path, CENTROIDS_FILE)
    old = (
        pq.read_table(cent_path).to_pandas()
        if os.path.exists(cent_path)
        else pd.DataFrame({"cell": [], "centroid": [], "n": []})
    )
    old_map = {
        int(r.cell): (np.asarray(list(r.centroid), dtype=np.float64), int(r.n))
        for r in old.itertuples()
    }
    for r in batch.itertuples():
        c = int(r.cell)
        bvec = np.asarray(list(r.centroid), dtype=np.float64)
        bn = int(r.n)
        if c in old_map:
            ovec, on = old_map[c]
            old_map[c] = ((ovec * on + bvec * bn) / (on + bn), on + bn)
        else:
            old_map[c] = (bvec, bn)
    merged = pd.DataFrame(
        {
            "cell": sorted(old_map),
            "centroid": [old_map[c][0].tolist() for c in sorted(old_map)],
            "n": [old_map[c][1] for c in sorted(old_map)],
        }
    )
    _write_centroids(merged, path)


@_with_maintenance_lock
def compact_ivf_cells(
    spark: SparkSession,
    path: str,
    *,
    sort_cols: tuple[str, ...] = (),
    min_files: int = 2,
) -> int:
    """Selective cell compaction — the IVF twin of plans/ingest.
    compact_chunks: every append lands one more file per touched cell, and
    probed-cell read cost is proportional to file count, so a maintenance
    pass rewrites ONLY the cells holding >= ``min_files`` parquet files
    into one sorted file each (dynamic partition overwrite — untouched
    cell directories keep their bytes). Returns the number of cells
    rewritten. Centroids are untouched: compaction moves bytes, never
    rows."""
    import glob

    recover_ivf_splits(path)
    meta = read_index_meta(path)
    cell_col = meta["cell_col"]
    fragmented: list[int] = []
    for d in glob.glob(os.path.join(path, f"{cell_col}=*")):
        if len(glob.glob(os.path.join(d, "*.parquet"))) >= min_files:
            fragmented.append(int(os.path.basename(d).split("=", 1)[1]))
    if not fragmented:
        return 0
    df = (
        read_parquet(spark, path)
        .filter(F.col(cell_col).isin(fragmented))
        .repartition(len(fragmented), cell_col)
        .sortWithinPartitions(cell_col, *sort_cols)
    )
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(cell_col)
        .parquet(path)
    )
    spark.catalog.refreshByPath(path)
    return len(fragmented)


def read_index_meta(path: str) -> dict:
    with open(os.path.join(path, META_FILE)) as f:
        return json.load(f)


def _update_index_meta(path: str, **kv) -> None:
    meta = {**read_index_meta(path), **kv}
    tmp = os.path.join(path, f".{META_FILE}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(path, META_FILE))


def read_ivf_cells(
    spark: SparkSession, path: str, cells: list[int] | None = None
) -> DataFrame:
    """Read the index restricted to ``cells`` (None = all).

    The isin filter lands on the PARTITION column, so Spark prunes the
    unprobed cell directories at planning time — files are never listed
    into the scan, which is strictly stronger than row-group skipping.
    """
    meta = read_index_meta(path)
    df = read_parquet(spark, path)
    if cells is not None:
        df = df.filter(F.col(meta["cell_col"]).isin([int(c) for c in cells]))
    return df


def build_chunks_ivf(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    *,
    n_cells: int | None = None,
    seed: int = 42,
) -> int:
    """IVF index over the RAG CHUNKS table itself — the approximate
    serving lane for the corpus the reference searches flat. KMeans cell
    assignment (operators/similarity.ivf_assign: fit once, broadcast
    model, map-only transform), then the standard cell-partitioned write
    with payload columns (filePath, chunkIndex, text is deliberately NOT
    copied — the serving hit carries the chunk's identity; text comes
    from the chunks table / payload store like every other sidecar).
    Returns the cell count. Serve with::

        IvfVectorServer(index_path, id_col="id", vec_col="vector",
                        payload_cols=("filePath", "chunkIndex"))

    Approximation contract: this lane is OPT-IN and separate from
    query_documents (which stays exact, the reference's behavior).
    n_cells defaults to ~sqrt(rows) clamped to [4, 4096] — the standard
    IVF sizing that keeps probed-cell cost ~sqrt(N) as the corpus grows.
    """
    from ..operators.similarity import ivf_assign

    chunks = read_parquet(spark, table_path).select(
        "id", "filePath", "chunkIndex", "vector"
    )
    n_rows = chunks.count()
    if n_cells is None:
        n_cells = max(4, min(4096, int(n_rows**0.5)))
    # MLlib KMeans faults when k exceeds the row count (tiny corpora) —
    # clamp; one cell is simply the flat layout
    n_cells = max(1, min(int(n_cells), n_rows))
    assigned, _model = ivf_assign(
        chunks, n_cells, id_col="id", vec_col="vector", seed=seed
    )
    write_ivf_index(
        assigned.withColumnRenamed("label", "cell"),
        index_path,
        sort_cols=("filePath", "chunkIndex"),
        meta={"source": f"chunks:{table_path}", "n_cells": int(n_cells)},
        vec_col="vector",
    )
    return int(n_cells)


@_with_maintenance_lock
def ivf_cell_stats(
    spark: SparkSession, path: str, *, vec_col: str = "embedding"
) -> DataFrame:
    """Per-cell health report — the drift signal IVF maintenance acts
    on: row count, mean/max L2 distance to the cell's centroid
    (quantization error — appends assign new vectors to FROZEN
    centroids, so a drifting distribution inflates it and recall
    decays), and the fill ratio vs the mean cell. One scan of the
    index + a broadcast join against the tiny centroid sidecar; all
    JVM fold expressions, no UDFs. Feed the result to
    ivf_maintenance_plan / split_ivf_cell."""
    import pyarrow.parquet as pq

    recover_ivf_splits(path)
    meta = read_index_meta(path)
    cell_col = meta["cell_col"]
    cents = pq.read_table(os.path.join(path, CENTROIDS_FILE)).to_pylist()
    spark_cents = F.broadcast(
        spark.createDataFrame(
            [(int(r["cell"]), [float(x) for x in r["centroid"]]) for r in cents],
            f"{cell_col} int, _centroid array<double>",
        )
    )
    df = read_parquet(spark, path).join(spark_cents, cell_col)
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("_centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    stats = (
        df.select(F.col(cell_col).alias("cell"), F.sqrt(d2).alias("_d"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("_d").alias("mean_dist"),
            F.max("_d").alias("max_dist"),
        )
    )
    mean_n = stats.agg(F.avg("n")).first()[0]
    return stats.withColumn(
        "fill_ratio", F.col("n") / F.lit(float(mean_n or 1.0))
    ).orderBy("cell")


def ivf_maintenance_plan(
    stats_rows: list,
    *,
    split_fill_ratio: float = 4.0,
    split_mean_dist: float | None = None,
) -> list[int]:
    """Cells that should SPLIT: overfull (fill_ratio past the threshold
    — a hot cell makes every probe that lands on it scan fill_ratio x
    the average work) or drifted (mean quantization error past the
    caller's bound). Pure driver-side function over collected stats."""
    out = []
    for r in stats_rows:
        if r["fill_ratio"] >= split_fill_ratio or (
            split_mean_dist is not None and r["mean_dist"] >= split_mean_dist
        ):
            out.append(int(r["cell"]))
    return sorted(out)


@_with_maintenance_lock
def ivf_maintain(
    spark: SparkSession,
    path: str,
    *,
    vec_col: str = "embedding",
    split_fill_ratio: float = 4.0,
    split_mean_dist: float | None = None,
    k: int = 2,
    max_splits: int | None = None,
    compact_min_files: int = 2,
    seed_col: str | None = None,
) -> dict:
    """The maintenance POLICY LOOP tying the verbs together: recover any
    crashed split, measure cell health (ivf_cell_stats), plan the splits
    (ivf_maintenance_plan), apply them worst-first under the
    ``max_splits`` cost budget, then compact fragmented cells. One call
    keeps an append-drifted index serving at rebuild-quality recall
    without ever rewriting more than the sick cells — the answer to
    recall decay on appended indexes (appends assign new vectors to
    FROZEN centroids; a drifting distribution inflates quantization
    error until the hot cells split).

    Cost posture: stats is one index scan; each split costs its one
    cell; compaction costs the fragmented cells. ``max_splits`` bounds a
    maintenance window — the plan is ordered worst-first (highest fill
    ratio, then highest mean distance), so a budget of 1 always fixes
    the sickest cell. Returns a report dict (recovered markers, cells
    split -> new ids, cells compacted, final cell count)."""
    recovered = recover_ivf_splits(path)
    stats = [r.asDict() for r in ivf_cell_stats(spark, path, vec_col=vec_col).collect()]
    planned = set(
        ivf_maintenance_plan(
            stats,
            split_fill_ratio=split_fill_ratio,
            split_mean_dist=split_mean_dist,
        )
    )
    by_cell = {int(r["cell"]): r for r in stats}
    # duplicate-heavy cells whose last split degenerated (one identical
    # subcell — no progress possible) carry a persisted no-split hint so
    # a cron loop doesn't rewrite the same bytes forever; the hint
    # expires once the cell's population changes materially (appends may
    # have made it splittable)
    no_split = {
        int(c): int(n)
        for c, n in (read_index_meta(path).get("no_split") or {}).items()
    }
    stale = [
        c
        for c in list(no_split)
        if c not in by_cell
        or not 0.8 <= by_cell[c]["n"] / no_split[c] <= 1.25
    ]
    for c in stale:
        del no_split[c]
    skipped = sorted(c for c in planned if c in no_split)
    planned -= set(skipped)

    def severity(c: int) -> float:
        # normalized against each trigger's own threshold, so a cell 4x
        # past the drift bound outranks one 1.2x past the fill bound
        r = by_cell[c]
        s = r["fill_ratio"] / split_fill_ratio
        if split_mean_dist is not None:
            s = max(s, r["mean_dist"] / split_mean_dist)
        return s

    order = sorted(planned, key=lambda c: (-severity(c), c))
    # a cell must hold >= 2 rows to split; k clamps to its population
    order = [c for c in order if by_cell[c]["n"] >= 2]
    if max_splits is not None:
        order = order[:max_splits]
    splits: dict[int, list[int]] = {}
    unsplittable: dict[int, int] = {}
    for cell in order:
        new_ids = split_ivf_cell(
            spark, path, cell,
            k=min(k, int(by_cell[cell]["n"])),
            vec_col=vec_col, seed_col=seed_col,
        )
        if len(new_ids) >= 2:
            splits[cell] = new_ids
        else:
            # degenerate: every row landed in one subcell (duplicate /
            # near-identical vectors) — hint the RENAMED cell so the
            # next pass doesn't rewrite the same bytes again
            unsplittable[cell] = new_ids[0]
            no_split[new_ids[0]] = int(by_cell[cell]["n"])
    if unsplittable or stale:
        _update_index_meta(
            path, no_split={str(c): n for c, n in no_split.items()}
        )
    compacted = compact_ivf_cells(spark, path, min_files=compact_min_files)
    import glob

    cell_col = read_index_meta(path)["cell_col"]
    n_cells = len(glob.glob(os.path.join(path, f"{cell_col}=*")))
    return {
        "recovered": recovered,
        "planned": sorted(planned),
        "split": {int(c): ids for c, ids in splits.items()},
        "unsplittable": {int(c): nid for c, nid in unsplittable.items()},
        "skipped_no_split": skipped,
        "deferred": sorted(
            planned - set(splits) - set(unsplittable)
        ),
        "compacted": compacted,
        "n_cells": n_cells,
    }


def _split_marker_path(path: str, cell: int) -> str:
    return os.path.join(path, f"._split_{cell}.json")


@_with_maintenance_lock
def recover_ivf_splits(path: str) -> list[int]:
    """Finish or undo splits that crashed mid-flight. A split's marker
    records (cell, new_ids); the centroid sidecar update is the COMMIT
    POINT (atomic rename). Marker present + old cell still in the
    sidecar -> the split never committed: remove any partial new dirs
    (the old dir is intact, a re-run starts clean). Marker present + old
    cell gone from the sidecar -> committed: remove the lingering old
    dir (roll forward). Returns the cells whose markers were resolved.
    Idempotent; called by every maintenance entry point."""
    import glob
    import shutil

    import pyarrow.parquet as pq

    resolved: list[int] = []
    cell_col = read_index_meta(path)["cell_col"]
    for marker in glob.glob(os.path.join(path, "._split_*.json")):
        with open(marker) as f:
            info = json.load(f)
        cell = int(info["cell"])
        cent_path = os.path.join(path, CENTROIDS_FILE)
        sidecar_cells = (
            set(pq.read_table(cent_path).column("cell").to_pylist())
            if os.path.exists(cent_path)
            else set()
        )
        if cell in sidecar_cells or not sidecar_cells:
            # not committed: roll back the partial new dirs
            for nid in info["new_ids"]:
                shutil.rmtree(
                    os.path.join(path, f"{cell_col}={nid}"),
                    ignore_errors=True,
                )
        else:
            # committed: roll forward — drop the superseded old dir
            shutil.rmtree(
                os.path.join(path, f"{cell_col}={cell}"), ignore_errors=True
            )
        os.remove(marker)
        resolved.append(cell)
    return resolved


@_with_maintenance_lock
def split_ivf_cell(
    spark: SparkSession,
    path: str,
    cell: int,
    *,
    k: int = 2,
    vec_col: str = "embedding",
    iters: int = 3,
    seed_col: str | None = None,
) -> list[int]:
    """Split ONE drifted/overfull cell into ``k`` subcells — bounded IVF
    maintenance (cost = the cell, never the index): a tiny distributed
    Lloyd refinement seeded deterministically, then the cell directory
    is rewritten as up to k new cell dirs (ids above the current max;
    an empty Lloyd cluster — duplicate vectors, k > distinct points —
    simply yields fewer subcells) and the centroid sidecar replaces the
    old row with the new means. Returns the new cell ids.

    Everything stays distributed: seeds and per-iteration centroids are
    k small arrays collected to the driver; rows never are. Crash
    safety: a marker file brackets the split and the atomic sidecar
    rename is the commit point — recover_ivf_splits (run on entry) rolls
    a crashed split back (partial new dirs removed, old dir intact) or
    forward (lingering old dir removed), so no crash point leaves
    duplicate rows or a sidecar referencing a missing dir. Serving
    processes observe the split at their next invalidate().
    """
    import shutil

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    recover_ivf_splits(path)
    meta = read_index_meta(path)
    cell_col = meta["cell_col"]
    cell_dir = os.path.join(path, f"{cell_col}={cell}")
    if not os.path.isdir(cell_dir):
        raise ValueError(f"no cell {cell} in {path}")
    df = read_parquet(spark, cell_dir).persist()
    try:
        vec = F.col(vec_col).cast("array<double>")
        order = (
            F.col(seed_col)
            if seed_col
            else F.xxhash64(F.concat_ws(",", vec.cast("array<string>")))
        )
        seeds = [
            [float(x) for x in r["_v"]]
            for r in df.select(vec.alias("_v"), order.alias("_o"))
            .orderBy("_o")
            .limit(k)
            .collect()
        ]
        if len(seeds) < k:
            raise ValueError(
                f"cell {cell} holds {len(seeds)} rows — nothing to split"
            )

        def nearest(cents):
            d2s = [
                F.aggregate(
                    F.zip_with(
                        vec,
                        vec_lit(c),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cents
            ]
            best = F.lit(0)
            best_d = d2s[0]
            for i in range(1, len(d2s)):
                best = F.when(d2s[i] < best_d, F.lit(i)).otherwise(best)
                best_d = F.least(best_d, d2s[i])
            return best

        cents = seeds
        for _ in range(iters):
            means = (
                df.withColumn("_a", nearest(cents))
                .groupBy("_a")
                .agg(
                    F.array(
                        *[
                            F.avg(vec.getItem(i))
                            for i in range(len(seeds[0]))
                        ]
                    ).alias("_m")
                )
                .collect()
            )
            got = {int(r["_a"]): [float(x) for x in r["_m"]] for r in means}
            cents = [got.get(i, cents[i]) for i in range(k)]

        import glob

        existing = [
            int(os.path.basename(d).split("=", 1)[1])
            for d in glob.glob(os.path.join(path, f"{cell_col}=*"))
        ]
        base = max(existing) + 1
        new_ids = list(range(base, base + k))
        marker = _split_marker_path(path, cell)
        with open(marker, "w") as f:
            json.dump({"cell": cell, "new_ids": new_ids}, f)
        out = df.withColumn("_a", nearest(cents)).withColumn(
            cell_col,
            F.element_at(
                F.array(*[F.lit(i) for i in new_ids]), F.col("_a") + 1
            ),
        ).drop("_a")
        (
            out.repartition(k, cell_col)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(cell_col)
            .parquet(path)
        )
    finally:
        df.unpersist()
    # an EMPTY Lloyd cluster (duplicate/near-identical vectors) writes no
    # dir under dynamic overwrite — keep only the (id, centroid) pairs
    # whose dir exists, with their actual populations (footer counts, no
    # extra job)
    counts = {}
    kept: list[tuple[int, list[float]]] = []
    for nid, c in zip(new_ids, cents):
        nd = os.path.join(path, f"{cell_col}={nid}")
        if not os.path.isdir(nd):
            continue
        n = 0
        for fn in os.listdir(nd):
            if fn.endswith(".parquet"):
                n += pq.ParquetFile(os.path.join(nd, fn)).metadata.num_rows
        counts[nid] = n
        kept.append((nid, c))
    new_ids = [nid for nid, _ in kept]
    # COMMIT POINT: the sidecar flips (atomic rename) BEFORE the old dir
    # is removed, so it never references a deleted cell — a crash in the
    # window leaves the old dir lingering, which recover_ivf_splits rolls
    # forward (marker + old cell absent from the sidecar)
    cent_path = os.path.join(path, CENTROIDS_FILE)
    old = pq.read_table(cent_path).to_pandas()
    old = old[old["cell"] != cell]
    add = pd.DataFrame(
        {
            "cell": new_ids,
            "centroid": [
                list(np.asarray(c, dtype=np.float64)) for _, c in kept
            ],
            "n": [counts[i] for i in new_ids],
        }
    )
    merged = (
        pd.concat([old, add], ignore_index=True)
        .sort_values("cell")
        .reset_index(drop=True)
    )
    # belt-and-braces under the maintenance flock: if the marker is gone
    # somebody resolved this split out from under us (only possible if a
    # caller bypassed the lock) — committing now would publish a sidecar
    # whose subcell dirs a recovery already rmtree'd
    if not os.path.exists(marker):
        raise RuntimeError(
            f"split marker for cell {cell} vanished before the sidecar "
            "commit — a concurrent recovery resolved this split; "
            "aborting without committing"
        )
    _write_centroids(merged, path)
    shutil.rmtree(cell_dir)
    os.remove(marker)
    spark.catalog.refreshByPath(path)
    return new_ids
