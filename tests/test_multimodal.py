import pytest

from mcp_local_rag_spark.operators import multimodal as mm


@pytest.fixture()
def media(spark):
    rows = [(1, bytearray(b"\x89PNGfakebytes1")), (2, bytearray(b"\x89PNGfakebytes2"))]
    df = spark.createDataFrame(rows, "id long, data binary")
    return mm.media_table(df, id_col="id", content_col="data", modality="image")


def test_media_table_schema(media):
    row = media.first()
    assert row.modality == "image"
    assert row.media_meta.n_bytes == 14
    assert len(row.media_meta.content_hash) == 64


def test_image_features_with_fake_decoder(media):
    out = {r.media_id: r for r in mm.image_features(media, decode_fn=mm.fake_image_decoder).collect()}
    assert set(out) == {"1", "2"}
    r = out["1"]
    assert (r.height, r.width, r.channels) == (8, 8, 3)
    assert abs(sum(r.embedding) - 1.0) < 1e-6
    # deterministic: same bytes -> same features
    again = mm.image_features(media, decode_fn=mm.fake_image_decoder).collect()
    assert {x.media_id: x.mean_luma for x in again} == {k: v.mean_luma for k, v in out.items()}


def test_image_default_decoder_raises(media):
    with pytest.raises(Exception) as e:
        mm.image_features(media).collect()
    assert "NotImplementedError" in str(e.value) or "decode" in str(e.value)


def test_sample_frames_udtf_shape(spark):
    df = spark.createDataFrame([(7, bytearray(b"videobytes"))], "id long, data binary")
    vids = mm.media_table(df, id_col="id", content_col="data", modality="video")
    frames = mm.sample_frames(vids, every_n=5, n_frames=3).collect()
    assert [(r.media_id, r.frame_index) for r in frames] == [("7", 0), ("7", 5), ("7", 10)]
    assert len({r.frame for r in frames}) == 3


def test_caption_postprocess_and_chunk_append(spark):
    """Captions become dedicated chunks appended after the text chunks with
    continuing indices; control chars stripped, 1000-char cap, empty
    captions dropped (reference visual.ts:151-159, shared.ts:96-127)."""
    text_chunks = spark.createDataFrame(
        [("/d.pdf", 0, "intro"), ("/d.pdf", 1, "body"), ("/e.pdf", 0, "only")],
        "doc_key string, chunk_index int, text string",
    )
    captions = spark.createDataFrame(
        [
            ("/d.pdf", 2, "A chart of\x07 revenue.\n"),
            ("/d.pdf", 1, "  An early diagram. "),
            ("/d.pdf", 3, "\x00\x1f"),           # empty after strip -> dropped
            ("/orphan.pdf", 1, "No text chunks doc."),
            ("/e.pdf", 9, "x" * 1500),
        ],
        "doc_key string, page_num int, caption string",
    )
    rows = {
        (r.doc_key, r.chunk_index): r.text
        for r in mm.caption_chunks(text_chunks, captions).collect()
    }
    # /d.pdf text chunks end at 1 -> captions at 2, 3, ordered by page
    assert rows[("/d.pdf", 2)] == "[Visual content on page 1: An early diagram.]"
    assert rows[("/d.pdf", 3)] == "[Visual content on page 2: A chart of revenue.]"
    # doc with no text chunks starts at 0
    assert rows[("/orphan.pdf", 0)] == "[Visual content on page 1: No text chunks doc.]"
    # 1000-char cap with ellipsis
    capped = rows[("/e.pdf", 1)]
    assert capped.startswith("[Visual content on page 9: " + "x" * 100)
    assert "…" in capped and len(capped) < 1100
    assert ("/d.pdf", 4) not in rows  # empty caption dropped


def test_visual_pipeline_candidates_to_caption_chunks(spark):
    """T10->T12 end-to-end with injected render/caption: candidate pages
    (from block geometry) are rendered+captioned and land as dedicated
    chunks after the text chunks."""
    from mcp_local_rag_spark.operators.pdf_layout import visual_candidates

    blocks = spark.createDataFrame(
        [
            # page 1 of /v.pdf: large image -> candidate
            ("/v.pdf", 1, 300.0, 300.0, "image", 100.0, 100.0, 200.0, 200.0),
            # page 2: tiny image -> NOT a candidate
            ("/v.pdf", 2, 300.0, 300.0, "image", 0.0, 0.0, 10.0, 10.0),
        ],
        "doc_key string, page int, page_width double, page_height double,"
        " kind string, x0 double, y0 double, x1 double, y1 double",
    )
    cands = visual_candidates(blocks, doc_col="doc_key")
    docs = spark.createDataFrame(
        [("/v.pdf", bytearray(b"%PDF-fake-bytes"))], "doc_key string, content binary"
    )
    captions = mm.caption_candidate_pages(
        docs, cands,
        render_fn=mm.fake_page_renderer, caption_fn=mm.fake_captioner,
    )
    rows = captions.collect()
    assert [(r.doc_key, r.page_num) for r in rows] == [("/v.pdf", 1)]
    assert rows[0].caption.startswith("figure ")

    # deterministic: same doc/crop -> same caption
    again = mm.caption_candidate_pages(
        docs, cands, render_fn=mm.fake_page_renderer, caption_fn=mm.fake_captioner
    ).collect()
    assert again[0].caption == rows[0].caption

    text_chunks = spark.createDataFrame(
        [("/v.pdf", 0, "intro text")], "doc_key string, chunk_index int, text string"
    )
    final = mm.caption_chunks(text_chunks, captions).collect()
    assert final[0].chunk_index == 1
    assert final[0].text.startswith("[Visual content on page 1: figure ")


def test_default_page_renderer_raises_without_fitz(spark):
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("fitz") is not None:
        _pytest.skip("pymupdf present; covered by real-backend smoke test")
    with _pytest.raises(NotImplementedError):
        mm.default_page_renderer(b"x", 0, None)
