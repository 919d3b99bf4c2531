"""Visual near-dup via perceptual dHash (VERDICT r8 #3): planted
recompressed duplicates must pair at Hamming 0 and resolve away; real
content edits must not pair."""

import numpy as np
import pytest

from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal


def _grid(seed: int) -> np.ndarray:
    y = np.arange(16).reshape(16, 1, 1)
    x = np.arange(18).reshape(1, 18, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((seed * 131 + y * 17 + x * 29 + c * 53) % 199).astype(np.uint8)


@pytest.fixture(scope="module")
def media(spark):
    """Three originals (BMP); one RECOMPRESSED twin of m0 (same pixels
    +1 uniform brightness, re-encoded as PNG — different bytes, same
    gradients) and one EDITED twin of m1 (+17 checkerboard)."""
    rows = [
        ("m0_a", multimodal.encode_bmp(_grid(2))),
        ("m0_dup", multimodal.encode_png((_grid(2).astype(np.int64) + 1)
                                         .astype(np.uint8))),
        ("m1_a", multimodal.encode_bmp(_grid(6))),
        ("m2_a", multimodal.encode_bmp(_grid(12))),
    ]
    y = np.arange(16).reshape(16, 1, 1)
    x = np.arange(18).reshape(1, 18, 1)
    cb = ((x // 2) + (y // 2)) % 2 == 0
    edited = (_grid(6).astype(np.int64) + np.where(cb, 17, 0)).astype(np.uint8)
    rows.append(("m1_edit", multimodal.encode_png(edited)))
    return spark.createDataFrame(rows, "media_id string, content binary")


def test_dhash_recompression_invariance():
    """BMP→PNG re-encode + uniform brightness keeps the hash bit-identical
    (gradients unchanged); a checkerboard edit flips many bits."""
    px = _grid(2)
    h_orig = multimodal.dhash_pixels(px)
    bright = (px.astype(np.int64) + 1).astype(np.uint8)
    back = multimodal.decode_image(multimodal.encode_png(bright), stub=False)
    assert multimodal.dhash_pixels(back) == h_orig

    y = np.arange(16).reshape(16, 1, 1)
    x = np.arange(18).reshape(1, 18, 1)
    cb = ((x // 2) + (y // 2)) % 2 == 0
    edited = (px.astype(np.int64) + np.where(cb, 17, 0)).astype(np.uint8)
    h_edit = multimodal.dhash_pixels(edited)
    assert bin((h_orig ^ h_edit) & (2**64 - 1)).count("1") > 2


def test_dhash_undersized_returns_none():
    assert multimodal.dhash_pixels(np.zeros((4, 4, 3), np.uint8)) is None


def test_near_dup_pairs_find_planted_twin_only(media):
    pairs = multimodal.image_near_dup_pairs(
        media, max_hamming=2, max_bucket_size=None, stub=False).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert got.get(("m0_a", "m0_dup")) == 0
    # the edited twin and the unrelated originals must not pair
    assert all({a, b} == {"m0_a", "m0_dup"} for a, b in got)


def test_near_dup_resolution_drops_larger_id(media):
    kept = sorted(r.media_id for r in multimodal.image_near_dup(
        media, max_hamming=2, max_bucket_size=None, stub=False).collect())
    # 'm0_a' < 'm0_dup' -> the recompressed copy is dropped
    assert kept == ["m0_a", "m1_a", "m1_edit", "m2_a"]


def test_image_dedup_against_store(spark, media):
    """Monthly story: the seen store carries only hashes; a new
    recompressed twin drops, an edited/unrelated image survives, and an
    undersized (NULL-hash) image is always kept."""
    seen = multimodal.image_dhash(
        media.filter("media_id IN ('m0_a', 'm1_a', 'm2_a')"), stub=False)
    tiny = multimodal.encode_bmp(np.zeros((4, 4, 3), np.uint8))
    new = media.filter("media_id IN ('m0_dup', 'm1_edit')").unionByName(
        spark.createDataFrame([("m_tiny", tiny)],
                              "media_id string, content binary"))
    kept = sorted(r.media_id for r in multimodal.image_dedup_against(
        new, seen, max_hamming=2, stub=False).collect())
    assert kept == ["m1_edit", "m_tiny"]


def test_video_near_dup_identical_blobs(spark):
    """The real blob path: two media ids carrying the SAME video bytes
    share every sampled frame digest (J=1) and resolve to one; a
    distinct blob shares none."""
    blob_a = bytes(range(200))
    blob_b = bytes(reversed(range(200)))
    rows = [("va1", "video", blob_a, "video/mp4", None, None, 3500),
            ("va2", "video", blob_a, "video/mp4", None, None, 3500),
            ("vb", "video", blob_b, "video/mp4", None, None, 3500)]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    pairs = multimodal.video_near_dup_pairs(media).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in pairs] == [("va1", "va2", 1.0)]
    kept = sorted(r.media_id
                  for r in multimodal.video_near_dup(media).collect())
    assert kept == ["va1", "vb"]


def test_video_dedup_against_store(spark):
    """Month 1's frame digests persist; month 2's identical blob drops,
    distinct footage survives."""
    blob_a = bytes(range(200))
    blob_b = bytes(reversed(range(200)))
    m1 = spark.createDataFrame(
        [("va1", "video", blob_a, "video/mp4", None, None, 3500)],
        multimodal.MEDIA_SCHEMA)
    seen = multimodal.sample_video_frames(m1).select(
        "media_id", "frame_digest")
    m2 = spark.createDataFrame(
        [("va2", "video", blob_a, "video/mp4", None, None, 3500),
         ("vb", "video", blob_b, "video/mp4", None, None, 3500)],
        multimodal.MEDIA_SCHEMA)
    kept = sorted(r.media_id for r in multimodal.video_dedup_against(
        m2, seen).collect())
    assert kept == ["vb"]
