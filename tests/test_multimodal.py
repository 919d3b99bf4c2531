import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", bytes([1, 2, 3]), "image/png", 16, 16, None),
        ("m2", "image", bytes([9, 9, 9]), "image/png", 16, 16, None),
        ("m3", "video", bytes([5, 5]), "video/mp4", 16, 16, 3500),
        ("m4", "audio", bytes([7]), "audio/wav", None, None, 100),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_image_features_shape_and_determinism(media):
    imgs = media.filter(F.col("kind") == "image")
    a = sorted(map(tuple, multimodal.image_features(imgs).collect()))
    b = sorted(map(tuple, multimodal.image_features(imgs).collect()))
    assert a == b and len(a) == 2
    for row in a:
        assert row[1] == 8 and row[2] == 8
        assert all(0 <= v <= 255 for v in row[3:6])


def test_audio_features(media):
    out = multimodal.audio_features(media.filter(F.col("kind") == "audio")).collect()
    assert len(out) == 1 and out[0].n_samples == 1600 and out[0].rms > 0


def test_video_frame_sampling_fanout(media):
    out = multimodal.sample_video_frames(
        media.filter(F.col("kind") == "video"), every_ms=1000
    ).collect()
    # 3500 ms at 1 frame/s -> frames at 0,1000,2000,3000
    assert [r.ts_ms for r in sorted(out, key=lambda r: r.frame_idx)] == [0, 1000, 2000, 3000]
    assert len({r.frame_digest for r in out}) == 4  # distinct frames


def test_decode_raises_without_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"x", stub=False)


def test_attach_media_keeps_blobs_out(spark, media, docs):
    feats = multimodal.image_features(media.filter(F.col("kind") == "image"))
    link = spark.createDataFrame([(0, "m1"), (1, "m2")], "doc_id long, media_id string")
    out = multimodal.attach_media(docs, feats, link)
    assert "content" not in out.columns
    got = {r.doc_id: r.media_id for r in out.filter(F.col("media_id").isNotNull()).collect()}
    assert got == {0: "m1", 1: "m2"}
