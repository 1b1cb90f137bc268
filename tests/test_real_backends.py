"""Skip-if-absent smoke tests for the REAL backends.

The pseudo embedder and fake image decoder are the container defaults;
these tests run the true implementations whenever the libraries exist so
the stand-ins cannot silently drift from the real interfaces (VERDICT r1
item 9). In this container they skip; on a host with the libs they gate
the contract: same signature, same output schema, same invariants.
"""

from __future__ import annotations

import importlib.util

import pytest


def _has(mod: str) -> bool:
    return importlib.util.find_spec(mod) is not None


@pytest.mark.skipif(
    not _has("sentence_transformers"), reason="sentence-transformers not installed"
)
def test_sentence_transformers_backend_matches_interface(spark):
    """backend='model' must satisfy the same contract the pseudo backend
    does: array<float> column, L2-normalized rows, identical text ->
    identical vector, row alignment preserved under length-sorted batching."""
    import numpy as np

    from mcp_local_rag_spark.embedder import embed_text_column

    df = spark.createDataFrame(
        [(0, "a short text"), (1, "a considerably longer sentence about spark"),
         (2, "a short text")],
        "id long, text string",
    )
    out = embed_text_column(df, backend="model").orderBy("id").collect()
    assert out[0].vector == out[2].vector  # determinism + row alignment
    v = np.array(out[1].vector, dtype=np.float64)
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3  # normalize_embeddings
    assert len(v) >= 256  # a real model dim, not the pseudo default


@pytest.mark.skipif(not _has("sentence_transformers"), reason="model lib absent")
def test_model_backend_vs_pseudo_schema_parity(spark):
    from mcp_local_rag_spark.embedder import embed_text_column

    df = spark.createDataFrame([("t",)], "text string")
    pseudo = embed_text_column(df, backend="pseudo")
    model = embed_text_column(df, backend="model")
    assert pseudo.schema["vector"].dataType == model.schema["vector"].dataType


@pytest.mark.skipif(not _has("PIL"), reason="Pillow not installed")
def test_real_image_decoder_through_pipeline(spark):
    """A real PIL decoder drops into image_features via decode_fn with no
    plumbing changes — PNG bytes in, (h, w, c, luma, histogram) out."""
    import io

    import numpy as np
    from PIL import Image

    from mcp_local_rag_spark.operators.multimodal import image_features, media_table

    def pil_decoder(content: bytes) -> np.ndarray:
        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))

    img = Image.new("RGB", (12, 8), color=(200, 10, 10))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame([("m1", bytearray(buf.getvalue()))], "id string, data binary")
    media = media_table(df, id_col="id", content_col="data", modality="image")
    row = image_features(media, decode_fn=pil_decoder).first()
    assert (row.height, row.width, row.channels) == (8, 12, 3)
    assert abs(sum(row.embedding) - 1.0) < 1e-6


@pytest.mark.skipif(not _has("fitz"), reason="pymupdf not installed")
def test_real_pdf_decode_through_parse_files(spark, tmp_path):
    """With pymupdf present, parse_text_bytes decodes a real PDF through
    the layout pipeline instead of raising NotImplementedError."""
    import fitz

    from mcp_local_rag_spark.sources.parsers import parse_text_bytes

    doc = fitz.open()
    page = doc.new_page()
    page.insert_text((72, 72), "A real pdf sentence for the smoke test.")
    data = doc.tobytes()
    out = parse_text_bytes("/x/smoke.pdf", data)
    assert "smoke test" in out["text"]
    assert out["title"]


def test_pseudo_paths_always_work(spark):
    """The container defaults the real-backend tests guard against must
    themselves stay green everywhere."""
    import numpy as np

    from mcp_local_rag_spark.embedder import embed_text_column
    from mcp_local_rag_spark.operators.multimodal import (
        fake_image_decoder,
        image_features,
        media_table,
    )

    df = spark.createDataFrame([(0, "text")], "id long, text string")
    row = embed_text_column(df).first()
    assert abs(float(np.linalg.norm(np.array(row.vector))) - 1.0) < 1e-6

    media = media_table(
        spark.createDataFrame([("m", bytearray(b"bytes"))], "id string, data binary"),
        id_col="id", content_col="data", modality="image",
    )
    feat = image_features(media, decode_fn=fake_image_decoder).first()
    assert (feat.height, feat.width, feat.channels) == (8, 8, 3)
