"""DCT perceptual hash (pHash, VERDICT r9 #6): planted RESCALED twins
must pair (the re-upload transform dHash's fixed cell grid misses);
content edits must not. The hash is exact integer arithmetic — the
quantized basis must match what the DuckDB oracle rebuilds from
round(cos(...)*1e6)."""

import numpy as np
import pytest

from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal


def _noise(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    y = np.arange(h).reshape(h, 1, 1)
    x = np.arange(w).reshape(1, w, 1)
    c = np.arange(3).reshape(1, 1, 3)
    return ((seed * 131 + y * 17 + x * 29 + c * 53) % 199).astype(np.uint8)


def _smooth(h: int, w: int) -> np.ndarray:
    """Natural-image-like content: energy in the low frequencies (ripples
    + gradient) — the regime where perceptual hashes earn their keep."""
    y = np.linspace(0, 1, h).reshape(h, 1)
    x = np.linspace(0, 1, w).reshape(1, w)
    img = (120 + 60 * np.cos(2 * np.pi * (1.3 * x + 0.7 * y))
           + 40 * np.cos(2 * np.pi * (2.1 * x - 1.1 * y)) + 30 * (x - y))
    return np.repeat(np.clip(img, 0, 255)[:, :, None], 3,
                     axis=2).astype(np.uint8)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_basis_matches_duckdb_round():
    """The Python HALF_UP-quantized basis must equal DuckDB's
    round(cos(pi()*(2y+1)*u/64)*1e6) — the oracle rebuilds it this way,
    so a single diverging constant would silently flip hash bits."""
    duckdb = pytest.importorskip("duckdb")
    b_py = multimodal._phash_basis(32, 8)
    rows = duckdb.sql(
        "SELECT CAST(round(cos(pi()*(2*y.g+1)*u.g/64)*1000000) AS BIGINT) "
        "FROM generate_series(0,7) u(g), generate_series(0,31) y(g) "
        "ORDER BY u.g, y.g").fetchall()
    assert (b_py == np.array([r[0] for r in rows]).reshape(8, 32)).all()


def test_phash_exact_replication_invariance():
    """2x nearest-neighbor upscale + uniform brightness + PNG re-encode
    keeps the hash BIT-IDENTICAL (the adaptive pool reproduces the same
    32x32 raster +3, which shifts only the DC term materially)."""
    base = _noise(7).astype(np.int64)
    h0 = multimodal.phash_pixels(base.astype(np.uint8))
    twin = np.repeat(np.repeat(base + 1, 2, axis=0), 2, axis=1)
    back = multimodal.decode_image(
        multimodal.encode_png(twin.astype(np.uint8)), stub=False)
    assert multimodal.phash_pixels(back) == h0


def test_phash_noninteger_rescale_robust_where_dhash_breaks():
    """The pHash claim in one assert: a NON-integer nearest-neighbor
    rescale (64->80, cell boundaries all shift) of smooth content stays
    within Hamming 2 for pHash while dHash lands far outside it."""
    base = _smooth(64, 64)
    idx = (np.arange(80) * 64) // 80
    rescaled = base[idx][:, idx]
    assert _ham(multimodal.phash_pixels(base),
                multimodal.phash_pixels(rescaled)) <= 2
    assert _ham(multimodal.dhash_pixels(base),
                multimodal.dhash_pixels(rescaled)) > 2


def test_phash_content_edit_flips_many_bits():
    base = _noise(7).astype(np.int64)
    edit = base.copy()
    edit[:, :32, :] += 40
    d = _ham(multimodal.phash_pixels(base.astype(np.uint8)),
             multimodal.phash_pixels(edit.astype(np.uint8)))
    assert d > 2


def test_phash_undersized_returns_none():
    assert multimodal.phash_pixels(np.zeros((16, 16, 3), np.uint8)) is None


def test_phash_pairs_find_planted_twin_only(spark):
    """End-to-end through the Manku machinery: rescaled twin pairs at
    Hamming 0, the edited twin does not, distinct images do not."""
    base = _noise(7).astype(np.int64)
    twin = np.repeat(np.repeat(base + 1, 2, axis=0), 2, axis=1)
    edit = base.copy()
    edit[:, :32, :] += 40
    rows = [
        ("m0_a", multimodal.encode_bmp(base.astype(np.uint8))),
        ("m0_twin", multimodal.encode_png(twin.astype(np.uint8))),
        ("m0_edit", multimodal.encode_png(edit.astype(np.uint8))),
        ("m1_a", multimodal.encode_bmp(_noise(19))),
        ("m_tiny", multimodal.encode_bmp(_noise(3, 16, 16))),  # -> NULL hash
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    pairs = multimodal.image_phash_near_dup_pairs(
        media, max_hamming=2, max_bucket_size=None, stub=False).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [
        ("m0_a", "m0_twin", 0)]


def test_strip_uniform_border_cases():
    base = _noise(7)
    bars = np.zeros((8, 64, 3), dtype=np.uint8)
    boxed = np.vstack([bars, base, bars])
    assert multimodal.strip_uniform_border(boxed).shape == (64, 64, 3)
    pillars = np.full((64, 6, 3), 7, dtype=np.uint8)
    pill = np.hstack([pillars, base, pillars])
    assert multimodal.strip_uniform_border(pill).shape == (64, 64, 3)
    assert (multimodal.strip_uniform_border(base) == base).all()
    blank = np.zeros((40, 40, 3), np.uint8)
    assert multimodal.strip_uniform_border(blank).shape == (40, 40, 3)


def test_phash_letterbox_twin_pairs_after_strip(spark):
    """A letterboxed +1-brightness PNG re-upload pairs with its original
    at hamming 0 only through the strip; an edit under the same bars
    never pairs."""
    base = _noise(7).astype(np.int64)
    bars = np.zeros((8, 64, 3), dtype=np.int64)
    boxed = np.vstack([bars, base + 1, bars])
    edit = base.copy()
    edit[:, :32, :] += 40
    boxed_edit = np.vstack([bars, edit, bars])
    rows = [
        ("m0_a", multimodal.encode_bmp(base.astype(np.uint8))),
        ("m0_box", multimodal.encode_png(boxed.astype(np.uint8))),
        ("m0_boxedit", multimodal.encode_png(boxed_edit.astype(np.uint8))),
    ]
    media = spark.createDataFrame(rows, "media_id string, content binary")
    with_strip = multimodal.image_phash_near_dup_pairs(
        media, max_hamming=2, max_bucket_size=None, stub=False,
        strip_border=True).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in with_strip] == [
        ("m0_a", "m0_box", 0)]
    without = multimodal.image_phash_near_dup_pairs(
        media, max_hamming=2, max_bucket_size=None, stub=False,
        strip_border=False).collect()
    # un-stripped: the bars dominate the low frequencies — no pair with
    # the original survives (the boxed twin and boxed edit may pair
    # with EACH OTHER; both contain the bars)
    assert not any("m0_a" in (p.id_a, p.id_b) for p in without)
