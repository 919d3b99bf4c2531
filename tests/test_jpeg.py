"""Baseline JPEG codec (operators/jpeg.py): roundtrip error bounds,
sampling/restart/grayscale paths, fail-closed rejections, and the
decode_image dispatch."""

import numpy as np
import pytest

from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)
from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
    decode_image,
)


def _grad(h=48, w=64, seed=42):
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    base = np.stack([(y * 2 + x) % 256, (x * 3) % 256, (y * 4) % 256],
                    axis=-1)
    return np.clip(base + rng.integers(-5, 6, base.shape),
                   0, 255).astype(np.uint8)


def test_zigzag_is_the_spec_order():
    assert ZIGZAG[:10] == [(0, 0), (0, 1), (1, 0), (2, 0), (1, 1),
                           (0, 2), (0, 3), (1, 2), (2, 1), (3, 0)]
    assert len(set(ZIGZAG)) == 64 and ZIGZAG[-1] == (7, 7)


@pytest.mark.parametrize("kwargs,max_err,mean_err", [
    ({}, 12, 4.0),
    ({"subsample": True}, 14, 4.5),
    ({"restart_interval": 3}, 12, 4.0),
    ({"quality": 50}, 16, 5.0),
])
def test_roundtrip_error_bounded(kwargs, max_err, mean_err):
    img = _grad()
    out = decode_jpeg(encode_jpeg(img, **kwargs))
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= max_err and err.mean() <= mean_err


def test_solid_color_exact_and_odd_dims():
    # a flat block quantizes losslessly at high quality, and 17x23
    # forces MCU edge padding + crop on both axes
    solid = np.full((17, 23, 3), 137, np.uint8)
    out = decode_jpeg(encode_jpeg(solid, quality=95))
    assert out.shape == (17, 23, 3)
    assert int(np.abs(out.astype(int) - 137).max()) == 0
    # 4:2:0 with odd dims pads chroma too
    out2 = decode_jpeg(encode_jpeg(solid, quality=95, subsample=True))
    assert out2.shape == (17, 23, 3)
    assert int(np.abs(out2.astype(int) - 137).max()) <= 1


def test_grayscale_single_component():
    y, x = np.mgrid[0:32, 0:40]
    g = np.clip(40 + y * 3 + x * 2, 0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (32, 40, 3)
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 6


def test_restart_markers_present_and_load_bearing():
    img = _grad(32, 32)
    blob = encode_jpeg(img, restart_interval=1)
    assert any(bytes([0xFF, 0xD0 + k]) in blob for k in range(8))
    out = decode_jpeg(blob)
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 4.0


def test_unsupported_and_truncation_fail_closed():
    blob = bytearray(encode_jpeg(_grad(16, 16)))
    sof = blob.find(b"\xff\xc0")
    blob[sof + 1] = 0xC9  # masquerade as arithmetic-coded
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
    # SOF2 is now a SUPPORTED frame (r12) — but a baseline stream
    # relabeled as progressive has an invalid scan header (Ss=0 with
    # Se=63) and must fail loudly, not decode garbage
    blob[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg(_grad(16, 16))[:40])  # no SOS reached
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_decode_image_dispatches_jpeg():
    img = _grad(16, 16)
    blob = encode_jpeg(img, quality=95)
    out = decode_image(blob)  # stub=False: must decode FOR REAL
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 3.0
    # a rejected variant falls back to the stub only under stub=True
    broken = bytearray(blob)
    broken[blob.find(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_image(bytes(broken))
    assert decode_image(bytes(broken), stub=True).shape == (16, 16, 3)


def test_fill_bytes_and_lone_ff():
    """T.81 B.1.1.2: 0xFF fill bytes before a marker must be skipped
    (real crawl files pad with them); a lone trailing 0xFF raises the
    documented ValueError, never IndexError (r11 review)."""
    img = np.full((16, 16, 3), 99, np.uint8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xdb")
    padded = bytes(blob[:i]) + b"\xff\xff\xff" + bytes(blob[i:])
    out = decode_jpeg(padded)
    assert int(np.abs(out.astype(int) - 99).max()) == 0
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff")


def test_multi_scan_rejected_loudly():
    """A scan covering fewer components than the frame (non-interleaved
    baseline) must raise NotImplementedError, not KeyError mid-decode."""
    blob = bytearray(encode_jpeg(np.full((8, 8, 3), 50, np.uint8)))
    i = blob.find(b"\xff\xda")
    # shrink the scan to 1 component: patch Ls and Ns, drop 2 comp specs
    # SOS payload: len(2) ns(1) [cid td_ta]*ns Ss Se AhAl
    ls = int.from_bytes(blob[i + 2:i + 4], "big")
    new_sos = bytes([0, 8, 1]) + bytes(blob[i + 5:i + 7]) + b"\x00\x3f\x00"
    blob2 = bytes(blob[:i + 2]) + new_sos + bytes(blob[i + 2 + ls:])
    with pytest.raises(NotImplementedError):
        decode_jpeg(blob2)


def test_progressive_equals_baseline_decode():
    """The cross-mode contract: encode_jpeg_progressive quantizes
    identically to encode_jpeg, so decoding the SOF2 stream must give
    pixel-identical output — any desync in DC/AC first scans, EOB
    runs, refinement correction bits, or per-scan restarts breaks
    equality somewhere in the sweep."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    cases = [((16, 24), {}), ((17, 23), {}),
             ((32, 40), {"subsample": True}),
             ((16, 24), {"restart_interval": 2}),
             ((48, 64), {"subsample": True, "restart_interval": 3}),
             ((24, 24), {"quality": 30}), ((8, 8), {}),
             ((17, 23), {"subsample": True, "restart_interval": 1}),
             ((40, 40), {"quality": 10})]
    for shape, kw in cases:
        px = rng.integers(0, 256, (*shape, 3)).astype(np.uint8)
        q = kw.pop("quality", 85)
        prog = encode_jpeg_progressive(px, quality=q, **kw)
        assert b"\xff\xc2" in prog  # really SOF2
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px, quality=q, **kw)),
            decode_jpeg(prog)), (shape, kw, q)
    # grayscale single-component script + smooth content (long EOB runs)
    g = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(g, quality=85)),
                          decode_jpeg(encode_jpeg_progressive(g, quality=85)))
    y, x = np.mgrid[0:64, 0:80]
    sm = np.stack([(y + x) // 2 % 256, y % 256, x % 256],
                  -1).astype(np.uint8)
    for kw in ({}, {"subsample": True}, {"restart_interval": 4}):
        assert np.array_equal(
            decode_jpeg(encode_jpeg(sm, quality=60, **kw)),
            decode_jpeg(encode_jpeg_progressive(sm, quality=60, **kw)))


def test_progressive_randomized_parity():
    """Property sweep: random dims/quality/flags, progressive decode
    must equal baseline decode bit-for-bit."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(1234)
    for _ in range(12):
        h = int(rng.integers(8, 50))
        w = int(rng.integers(8, 50))
        q = int(rng.integers(8, 98))
        sub = bool(rng.integers(0, 2))
        ri = int(rng.integers(0, 4))
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg(px, quality=q, subsample=sub,
                                    restart_interval=ri)),
            decode_jpeg(encode_jpeg_progressive(
                px, quality=q, subsample=sub, restart_interval=ri))), \
            (h, w, q, sub, ri)


def test_progressive_decodes_via_decode_image():
    from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    img = _grad(16, 16)
    out = decode_image(encode_jpeg_progressive(img, quality=95))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - img.astype(int)).mean() <= 3.0
