"""Product quantization (operators/pq) + the PQ mode of the IVF server:
codebook determinism, reconstruction sanity, sidecar round-trip, and the
serving-path memory/recall trade."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_local_rag_spark.operators import pq
from mcp_local_rag_spark.operators.ivf_serve import IvfVectorServer
from mcp_local_rag_spark.plans.ann_index import write_ivf_index
from mcp_local_rag_spark.session import load

SF = "/root/testdata/sf0.01"


def _mat(n=400, dim=64, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim)


def test_codebooks_deterministic_and_shaped():
    mat = _mat()
    b1 = pq.train_pq_codebooks(mat, m=8, k=32, seed=7)
    b2 = pq.train_pq_codebooks(mat, m=8, k=32, seed=7)
    assert b1.shape == (8, 32, 8)
    assert np.array_equal(b1, b2)
    with pytest.raises(ValueError):
        pq.train_pq_codebooks(mat, m=7)  # 64 % 7 != 0
    with pytest.raises(ValueError):
        pq.train_pq_codebooks(mat, k=300)


def test_encode_adc_approximates_dots():
    mat = _mat()
    books = pq.train_pq_codebooks(mat, m=8, k=64, seed=0)
    codes = pq.encode_pq(mat, books)
    assert codes.shape == (400, 8) and codes.dtype == np.uint8
    q = _mat(1, seed=9)[0]
    approx = pq.adc_dots(codes, pq.adc_dot_table(q, books))
    exact = mat @ q
    # ADC must track exact dots better than a null predictor — note
    # i.i.d. gaussians are PQ's worst case (zero structure to exploit;
    # ~0.75 bits/dim here); real embedding corpora cluster and do far
    # better (the recall gate below runs on the actual testdata corpus)
    resid = np.abs(approx - exact).mean()
    null = np.abs(exact - exact.mean()).mean()
    assert resid < 0.75 * null, (resid, null)
    # finer codebooks reduce the residual
    books2 = pq.train_pq_codebooks(mat, m=16, k=64, seed=0)
    approx2 = pq.adc_dots(pq.encode_pq(mat, books2), pq.adc_dot_table(q, books2))
    assert np.abs(approx2 - exact).mean() < resid


def test_sidecar_round_trip(tmp_path):
    books = pq.train_pq_codebooks(_mat(), m=4, k=16, seed=1)
    pq.write_pq_sidecar(str(tmp_path), books)
    assert np.array_equal(pq.read_pq_sidecar(str(tmp_path)), books)


@pytest.fixture(scope="module")
def pq_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_pq") / "ann")
    emb = load(spark, SF, "embeddings")
    write_ivf_index(
        emb.withColumn("cell", F.col("label")),
        path,
        sort_cols=("vec_id",),
        meta={"source": "label"},
    )
    pq.train_pq_for_index(path, m=8, k=64, seed=0)
    return path


def test_pq_server_memory_and_recall(spark, pq_index):
    """quantization='pq': resident cell cache shrinks ~dim*8/m x (uint8
    codes vs float64 rows; 64x at dim=64, m=8) while the default
    ADC-shortlist + exact-refine path keeps recall@10 vs the exact server
    near 1.0 — on a corpus that is PQ's worst case (near-i.i.d. unit
    vectors; the label cells explain ~2% of variance)."""
    exact = IvfVectorServer(pq_index)
    pqs = IvfVectorServer(pq_index, quantization="pq")
    emb = load(spark, SF, "embeddings")
    qrows = emb.filter(F.col("vec_id") < 30).collect()
    hits = total = adc_hits = 0
    for r in qrows:
        cells = exact.probe_cells(r.embedding, nprobe=2)
        want = {h["neighbor_id"] for h in exact.query(r.embedding, 10, cells=cells)}
        got = {h["neighbor_id"] for h in pqs.query(r.embedding, 10, cells=cells)}
        adc = {
            h["neighbor_id"]
            for h in pqs.query(r.embedding, 10, cells=cells, refine=0)
        }
        hits += len(want & got)
        adc_hits += len(want & adc)
        total += len(want)
    assert total > 0 and hits / total >= 0.95, hits / total
    # pure ADC (refine=0, no point-read) is better than chance but below
    # the refined path — the trade the refine read exists to close
    assert 0.3 <= adc_hits / total <= hits / total, adc_hits / total
    # one bounded point-read per refined query, none for refine=0
    assert pqs.refine_reads == len(qrows)
    ratio = exact.cached_bytes() / max(1, pqs.cached_bytes())
    assert ratio > 30.0, ratio


def test_pq_mode_requires_sidecar(spark, tmp_path):
    emb = load(spark, SF, "embeddings")
    path = str(tmp_path / "ann_nosidecar")
    write_ivf_index(
        emb.withColumn("cell", F.col("label")), path,
        sort_cols=("vec_id",), meta={"source": "label"},
    )
    with pytest.raises(FileNotFoundError):
        IvfVectorServer(path, quantization="pq")


def test_unknown_quantization_rejected(spark, pq_index):
    with pytest.raises(ValueError):
        IvfVectorServer(pq_index, quantization="fp4")


def test_persisted_codes_serve_identically(spark, pq_index):
    """encode_index_codes materializes the cell-partitioned codes sidecar
    (one Spark job); a PQ server with it present returns ROW-IDENTICAL
    results to on-the-fly encoding while never reading the vector column
    on cell loads (code_loads counts the sidecar reads instead)."""
    emb = load(spark, SF, "embeddings")
    onfly = IvfVectorServer(pq_index, quantization="pq")
    qrows = emb.filter(F.col("vec_id") < 12).collect()
    want = [
        onfly.query(r.embedding, 10, cells=onfly.probe_cells(r.embedding, 2))
        for r in qrows
    ]
    n = pq.encode_index_codes(spark, pq_index)
    assert n == emb.count()
    coded = IvfVectorServer(pq_index, quantization="pq")
    got = [
        coded.query(r.embedding, 10, cells=coded.probe_cells(r.embedding, 2))
        for r in qrows
    ]
    assert got == want
    assert coded.code_loads > 0 and onfly.code_loads == 0


def test_index_rebuild_wipes_codes_sidecar(spark, tmp_path):
    """The codes sidecar lives INSIDE the index dir: a full index rebuild
    (overwrite of the whole directory) removes it, so a rebuilt index can
    never serve stale codes."""
    import os

    emb = load(spark, SF, "embeddings")
    path = str(tmp_path / "ann_rebuild")
    write_ivf_index(
        emb.withColumn("cell", F.col("label")), path,
        sort_cols=("vec_id",), meta={"source": "label"},
    )
    pq.train_pq_for_index(path, m=8, k=64, seed=0)
    pq.encode_index_codes(spark, path)
    assert os.path.isdir(os.path.join(path, pq.PQ_CODES_DIR))
    write_ivf_index(
        emb.withColumn("cell", F.col("label")), path,
        sort_cols=("vec_id",), meta={"source": "label"},
    )
    assert not os.path.isdir(os.path.join(path, pq.PQ_CODES_DIR))


def test_stale_codes_cell_falls_back_after_append(spark, tmp_path):
    """Incremental append leaves the codes sidecar stale for the touched
    cells; the per-cell footer row-count check detects it and that cell
    falls back to on-the-fly encoding — appended vectors are NEVER
    silently dropped. Untouched cells keep serving from codes."""
    from mcp_local_rag_spark.plans.ann_index import append_to_ivf_index

    emb = load(spark, SF, "embeddings")
    path = str(tmp_path / "ann_append")
    write_ivf_index(
        emb.withColumn("cell", F.col("label")), path,
        sort_cols=("vec_id",), meta={"source": "label"},
    )
    pq.train_pq_for_index(path, m=8, k=64, seed=0)
    pq.encode_index_codes(spark, path)

    probe = load(spark, SF, "embeddings").filter(F.col("vec_id") == 0).first()
    target_cell = int(probe.label)
    new_id = 10_000_000
    append_to_ivf_index(
        emb.filter(F.col("vec_id") == 0)
        .select(
            F.lit(new_id).cast("long").alias("vec_id"),
            F.col("embedding"),
            F.col("label").cast("long"),
        )
        .withColumn("cell", F.col("label")),
        path,
        sort_cols=("vec_id",),
    )
    server = IvfVectorServer(path, quantization="pq")
    hits = server.query(probe.embedding, 5, cells=[target_cell])
    got = {h["neighbor_id"] for h in hits}
    # the appended duplicate of vec 0 must rank at the top alongside it
    assert new_id in got and 0 in got, got
    # an untouched cell still serves straight from the codes sidecar
    other = next(
        int(c) for c in server._cent_cells if int(c) != target_cell
    )
    before = server.code_loads
    server.query(probe.embedding, 5, cells=[other])
    assert server.code_loads == before + 1


def test_codebook_retrain_wipes_codes_sidecar(spark, tmp_path):
    """New codebooks invalidate persisted codes (same row counts, wrong
    ADC basis) — write_pq_sidecar wipes the codes dir so a retrain can
    never be served against stale codes."""
    import os

    emb = load(spark, SF, "embeddings")
    path = str(tmp_path / "ann_retrain")
    write_ivf_index(
        emb.withColumn("cell", F.col("label")), path,
        sort_cols=("vec_id",), meta={"source": "label"},
    )
    pq.train_pq_for_index(path, m=8, k=64, seed=0)
    pq.encode_index_codes(spark, path)
    assert os.path.isdir(os.path.join(path, pq.PQ_CODES_DIR))
    pq.train_pq_for_index(path, m=8, k=64, seed=1)  # retrain
    assert not os.path.isdir(os.path.join(path, pq.PQ_CODES_DIR))


def test_morton_key_width_guard():
    import pytest as _pytest
    from pyspark.sql import functions as _F

    from mcp_local_rag_spark.plans.zorder import morton_key

    with _pytest.raises(ValueError):
        morton_key([_F.lit(0)] * 8, 8)  # 64 bits: sign-bit inversion
