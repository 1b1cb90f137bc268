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
