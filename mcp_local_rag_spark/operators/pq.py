"""Product quantization (PQ) for the IVF serving tier — the 1B-vector
resident-memory posture (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search").

The vector space is split into ``m`` contiguous subspaces; each subspace
gets its own k-way codebook (Lloyd's in numpy, deterministic seed), and a
vector is stored as ``m`` uint8 codes — 8 bytes instead of 512 for a
64-dim float64 row (64x). Query-time scoring is ADC (asymmetric distance
computation): ONE (m x k) table of subspace partial dot products per
query, then every stored vector's approximate dot is m table lookups —
no decode, no float matrix.

Where this sits vs the int8 cell cache (operators/ivf_serve): int8 is the
drop-in 8x with near-exact recall; PQ is the order-of-magnitude tier for
corpora whose hot-cell working set would not fit even at int8. Exact
norms are kept per row (O(rows), not O(rows x dim)) so the cosine
denominator stays exact — only the dot is approximated.

The index-coupled path (train_pq_for_index + the server's "pq" mode) is
RESIDUAL PQ, the paper's IVFADC: codes quantize x - centroid(cell), not
x, because residual variance is a fraction of raw variance once the
coarse quantizer has explained the cluster structure — same 8-byte
budget, far higher recall. Query-time dot is then the exact per-cell
centroid dot (one scalar per probed cell) plus the ADC residual dot.

The reference has no ANN tier at all (flat LanceDB scan,
src/vectordb/index.ts:346); this extends the repo's scale surface.
"""

from __future__ import annotations

import numpy as np

from ..session import read_parquet

PQ_CODEBOOKS_FILE = "_pq_codebooks.parquet"
PQ_CODES_DIR = "_pq_codes"


def train_pq_codebooks(
    mat: np.ndarray, *, m: int = 8, k: int = 256, iters: int = 10, seed: int = 0
) -> np.ndarray:
    """Per-subspace Lloyd's k-means -> (m, k, dim/m) float64 codebooks.

    Deterministic: seeded sample init, ties in assignment break on the
    lower code, empty cells re-seeded from the worst-quantized points —
    each empty cell takes a DISTINCT point off the ranked-worst list, so
    several cells emptying in one iteration cannot collapse onto one
    duplicate centroid. ``k`` caps at the training-row count (codes stay
    uint8: k <= 256)."""
    mat = np.asarray(mat, dtype=np.float64)
    n, dim = mat.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if k > 256:
        raise ValueError("PQ codes are uint8: k <= 256")
    k = min(k, n)
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        sub_sq = (sub ** 2).sum(axis=1)
        cent = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # squared L2 via the expansion (no (n, k, dsub) temp);
            # argmin ties -> lowest code
            d2 = sub_sq[:, None] - 2.0 * (sub @ cent.T) + (cent ** 2).sum(axis=1)[None, :]
            assign = np.argmin(d2, axis=1)
            # rank points by how badly they're quantized ONCE per
            # iteration; each empty cell consumes the next distinct
            # worst point (reusing a stale argmax would hand every
            # empty cell the same centroid)
            worst = np.argsort(-d2.min(axis=1), kind="stable")
            next_worst = 0
            for j in range(k):
                mask = assign == j
                if mask.any():
                    cent[j] = sub[mask].mean(axis=0)
                else:
                    cent[j] = sub[worst[next_worst % n]]
                    next_worst += 1
        books[s] = cent
    return books


def encode_pq(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Vectors -> (n, m) uint8 codes (nearest subspace centroid, L2)."""
    mat = np.asarray(mat, dtype=np.float64)
    m, k, dsub = books.shape
    codes = np.empty((mat.shape[0], m), dtype=np.uint8)
    for s in range(m):
        sub = mat[:, s * dsub : (s + 1) * dsub]
        d2 = (
            (sub ** 2).sum(axis=1)[:, None]
            - 2.0 * (sub @ books[s].T)
            + (books[s] ** 2).sum(axis=1)[None, :]
        )
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def adc_dot_table(query_vec, books: np.ndarray) -> np.ndarray:
    """(m, k) table of subspace partial dots with the query — built once
    per query; approximate dot(x, q) = sum over subspaces of
    table[s, code[s]]."""
    q = np.asarray(query_vec, dtype=np.float64)
    m, k, dsub = books.shape
    return np.einsum("skd,sd->sk", books, q.reshape(m, dsub))


def adc_dots(codes: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Approximate dots for (n, m) codes via m lookups per row."""
    m = codes.shape[1]
    return table[np.arange(m)[None, :], codes].sum(axis=1)


def write_pq_sidecar(index_path: str, books: np.ndarray) -> None:
    """Persist codebooks next to the index (same style as the centroid
    sidecar): columns (sub, code, centroid list<double>). Any existing
    codes sidecar is WIPED first — codes are only meaningful against the
    codebooks that encoded them, and the server's row-count freshness
    check cannot tell a codebook swap apart (same counts, wrong ADC)."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    codes_dir = os.path.join(index_path, PQ_CODES_DIR)
    if os.path.isdir(codes_dir):
        shutil.rmtree(codes_dir)

    m, k, _ = books.shape
    subs = np.repeat(np.arange(m), k)
    codeno = np.tile(np.arange(k), m)
    tbl = pa.table(
        {
            "sub": pa.array(subs, type=pa.int32()),
            "code": pa.array(codeno, type=pa.int32()),
            "centroid": pa.array(
                [books[s, j].tolist() for s, j in zip(subs, codeno)],
                type=pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(index_path, PQ_CODEBOOKS_FILE))


def read_pq_sidecar(index_path: str) -> np.ndarray:
    import os

    import pyarrow.parquet as pq

    tbl = pq.read_table(os.path.join(index_path, PQ_CODEBOOKS_FILE))
    subs = tbl["sub"].to_numpy(zero_copy_only=False)
    codes = tbl["code"].to_numpy(zero_copy_only=False)
    cents = tbl["centroid"].to_pylist()
    m = int(subs.max()) + 1
    k = int(codes.max()) + 1
    dsub = len(cents[0])
    books = np.empty((m, k, dsub), dtype=np.float64)
    for s, j, c in zip(subs, codes, cents):
        books[int(s), int(j)] = c
    return books


def read_cell_centroids(index_path: str) -> tuple[np.ndarray, np.ndarray]:
    """(cells sorted asc, matching centroid matrix) from the index's
    coarse-quantizer sidecar — the subtraction basis for residual PQ."""
    import os

    import pyarrow.parquet as pqt

    from ..plans.ann_index import CENTROIDS_FILE

    cents = pqt.read_table(os.path.join(index_path, CENTROIDS_FILE))
    cells = cents["cell"].to_numpy(zero_copy_only=False)
    order = np.argsort(cells)
    mat = np.array(
        [list(v) for v in cents["centroid"].to_pylist()], dtype=np.float64
    )[order]
    return cells[order].astype(np.int64), mat


def residualize(mat: np.ndarray, cell: int, cells: np.ndarray, cents: np.ndarray):
    """mat - centroid(cell); identity (and centroid None) for a cell the
    coarse sidecar doesn't know (can't happen on a consistent index)."""
    pos = np.searchsorted(cells, cell)
    if pos < len(cells) and cells[pos] == cell:
        c = cents[pos]
        return mat - c[None, :], c
    return mat, None


def encode_index_codes(
    spark,
    index_path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Materialize the residual codes for EVERY index row as a
    cell-partitioned sidecar table (id, pq_code binary[m], pq_norm
    double) — one Spark job, Arrow-batched encoding against broadcast
    codebooks. A PQ-mode server with this sidecar present reads m bytes
    per row on a cold cell load instead of dim*8 (and skips the encode
    CPU); raw vectors are then touched only by the refine point-read —
    the full IVFADC serving posture. The sidecar lives INSIDE the index
    directory, so an index rebuild (mode=overwrite of the whole dir)
    can never leave stale codes behind. Returns rows encoded."""
    import os

    from pyspark.sql import functions as F

    from ..plans.ann_index import read_index_meta

    books = read_pq_sidecar(index_path)
    cells, cents = read_cell_centroids(index_path)
    cell_col = read_index_meta(index_path)["cell_col"]
    df = read_parquet(spark, index_path).select(cell_col, id_col, vec_col)
    id_type = dict(df.dtypes)[id_col]
    out_schema = (
        f"{cell_col} long, {id_col} {id_type}, pq_code binary, pq_norm double"
    )

    def _encode(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1)
            codes = np.empty((len(pdf), books.shape[0]), dtype=np.uint8)
            cvals = pdf[cell_col].to_numpy()
            for cell in np.unique(cvals):
                m = cvals == cell
                resid, _ = residualize(mat[m], int(cell), cells, cents)
                codes[m] = encode_pq(resid, books)
            yield pd.DataFrame(
                {
                    cell_col: cvals.astype(np.int64),
                    id_col: pdf[id_col].to_numpy(),
                    "pq_code": [c.tobytes() for c in codes],
                    "pq_norm": norms,
                }
            )

    coded = df.mapInPandas(_encode, out_schema)
    # one task per cell before partitionBy — same small-file discipline
    # as write_ivf_index
    (
        coded.repartition(max(len(cells), 1), cell_col)
        .write.mode("overwrite")
        .partitionBy(cell_col)
        .parquet(os.path.join(index_path, PQ_CODES_DIR))
    )
    import pyarrow.dataset as ds

    # footer-count only — no extra Spark job over the sidecar
    return ds.dataset(
        os.path.join(index_path, PQ_CODES_DIR),
        format="parquet",
        partitioning="hive",
    ).count_rows()


def train_pq_for_index(
    index_path: str,
    *,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 256,
    train_rows: int = 16384,
    seed: int = 0,
) -> np.ndarray:
    """Train RESIDUAL codebooks (x - centroid(cell), IVFADC) from a
    bounded sample of the index's own vectors (lowest cell directories
    first — deterministic) and write the sidecar. The sample is capped at
    ``train_rows`` regardless of corpus size, so build cost is O(1) in
    the corpus."""
    import pyarrow.dataset as ds

    cells, cents = read_cell_centroids(index_path)
    dataset = ds.dataset(index_path, format="parquet", partitioning="hive")
    batches = []
    seen = 0
    for frag in sorted(dataset.get_fragments(), key=lambda f: f.path):
        keys = ds.get_partition_keys(frag.partition_expression)
        cell = int(next(iter(keys.values())))
        tbl = frag.to_table(columns=[vec_col])
        if len(tbl):
            flat = tbl[vec_col].combine_chunks().flatten().to_numpy(
                zero_copy_only=False
            )
            mat = np.asarray(flat, dtype=np.float64).reshape(len(tbl), -1)
            batches.append(residualize(mat, cell, cells, cents)[0])
            seen += len(tbl)
        if seen >= train_rows:
            break
    if not batches:
        raise ValueError(f"no vectors to train PQ on in {index_path}")
    mat = np.concatenate(batches)[:train_rows]
    books = train_pq_codebooks(mat, m=m, k=k, seed=seed)
    write_pq_sidecar(index_path, books)
    return books
