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


def _bmp_bytes(pixels):
    """Minimal 24-bit bottom-up BMP from an HxWx3 RGB uint8 array."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    img = bytearray()
    for row in pixels[::-1]:                      # bottom-up
        r = bytearray()
        for px in row:
            r += bytes([px[2], px[1], px[0]])     # BGR
        r += b"\x00" * (row_bytes - len(r))
        img += r
    header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(img), 0, 0, 0, 0)
    return header + info + bytes(img)


def _wav_bytes(samples, framerate=8000):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes((np.asarray(samples) * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def test_decode_bmp_real_pixels_roundtrip():
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import decode_bmp, decode_image

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    got = decode_bmp(_bmp_bytes(px))
    assert got.shape == (2, 3, 3) and (got == px).all()
    # decode_image auto-detects BMP and decodes REAL even with stub=False
    assert (decode_image(_bmp_bytes(px)) == px).all()


def test_decode_wav_real_pcm_roundtrip():
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import decode_audio

    samples = np.linspace(-0.5, 0.5, 32)
    got = decode_audio(_wav_bytes(samples))
    assert got.shape == (32,)
    assert np.abs(got - samples).max() < 1e-3   # int16 quantization


def test_image_features_on_real_bmp(spark):
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal as mm

    # solid-color 8x8: mean features must equal the color exactly
    px = np.zeros((8, 8, 3), np.uint8)
    px[:, :, 0] = 200; px[:, :, 1] = 100; px[:, :, 2] = 50
    df = spark.createDataFrame(
        [("m1", "image", bytearray(_bmp_bytes(px)), "image/bmp", 8, 8, None)],
        mm.MEDIA_SCHEMA)
    row = mm.image_features(df, stub=False, target=(4, 4)).collect()[0]
    assert (row.mean_r, row.mean_g, row.mean_b) == (200.0, 100.0, 50.0)


def test_audio_features_on_real_wav(spark):
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal as mm

    samples = np.sin(np.linspace(0, 20 * np.pi, 800)) * 0.25
    df = spark.createDataFrame(
        [("a1", "audio", bytearray(_wav_bytes(samples)), "audio/wav", None, None, 100)],
        mm.MEDIA_SCHEMA)
    row = mm.audio_features(df, stub=False).collect()[0]
    assert row.n_samples == 800
    assert abs(row.rms - 0.25 / 2**0.5) < 1e-2  # sine RMS = A/sqrt(2)


def test_stub_decode_never_raises_on_magic_byte_collisions():
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        decode_audio, decode_image)

    # text starting with the BMP magic must fall back to the stub
    px = decode_image(b"BMW group annual report text", stub=True)
    assert px.shape == (16, 16, 3)
    # a RIFF container that is not PCM WAV (e.g. WebP) falls back too
    pcm = decode_audio(b"RIFF\x10\x00\x00\x00WEBPVP8 ", stub=True)
    assert pcm.dtype == np.float32
    # with stub=False the same inputs DO raise (honest failure)
    import pytest
    with pytest.raises(ValueError):
        decode_image(b"BMW group annual report text", stub=False)
    with pytest.raises(Exception):
        decode_audio(b"RIFF\x10\x00\x00\x00WEBPVP8 ", stub=False)


def test_decode_netpbm_ppm_and_pgm_golden():
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import decode_netpbm

    # P6 2x2 RGB with a comment line in the header
    ppm = b"P6\n# test\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  10, 20, 30])
    img = decode_netpbm(ppm)
    assert img.shape == (2, 2, 3) and img.dtype == np.uint8
    assert list(img[0, 0]) == [255, 0, 0]
    assert list(img[1, 1]) == [10, 20, 30]
    # P5 grayscale replicates into 3 channels
    pgm = b"P5 3 1 255\n" + bytes([0, 128, 255])
    g = decode_netpbm(pgm)
    assert g.shape == (1, 3, 3)
    assert list(g[0, 1]) == [128, 128, 128]


def test_decode_netpbm_truncation_and_stub_fallback():
    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        decode_image, decode_netpbm)

    with pytest.raises(ValueError):
        decode_netpbm(b"P6\n2 2\n255\n\x00\x01")     # not enough samples
    with pytest.raises(ValueError):
        decode_netpbm(b"P6 2 2")                      # truncated header
    # a P5-prefixed non-image falls back to the stub instead of raising
    fake = decode_image(b"P5ANO_IMAGE", stub=True)
    assert fake.shape == (16, 16, 3)


def test_bmp_encode_decode_roundtrip():
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        decode_bmp, encode_bmp)

    rng = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert (decode_bmp(encode_bmp(rng)) == rng).all()
    # odd width exercises the 4-byte row padding
    odd = (np.arange(3 * 3 * 3, dtype=np.uint8) * 7 % 256).astype(np.uint8).reshape(3, 3, 3)
    assert (decode_bmp(encode_bmp(odd)) == odd).all()


def test_decode_bmp_rejects_non_and_unsupported_bmp():
    import struct

    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import decode_bmp

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"JUNKJUNK" * 10)
    # valid 'BM' + header but 8bpp: explicit unsupported-depth error
    header = struct.pack("<2sIHHI", b"BM", 54 + 4, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 8, 0, 4, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(header + info + b"\x00\x00\x00\x00")


def test_png_encode_decode_roundtrip_all_filters():
    """encode_png(filter_mode='cycle') filters row y with type y % 5, so
    ONE image exercises every unfilter branch (None/Sub/Up/Average/
    Paeth); the decode must be bit-exact. 7 rows guarantees at least two
    cycles' worth of filter transitions; odd width exercises the
    left-pixel stride at a non-multiple-of-4 row length."""
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        decode_image, decode_png, encode_png)

    rng = np.random.default_rng(7).integers(0, 256, (7, 5, 3), np.uint8)
    blob = encode_png(rng)
    assert (decode_png(blob) == rng).all()
    assert (decode_image(blob) == rng).all()  # dispatch by signature
    # filter_mode='none' path too
    assert (decode_png(encode_png(rng, filter_mode="none")) == rng).all()


def test_png_color_types_gray_palette_alpha():
    """The decoder's non-RGB color types normalize to HxWx3: gray (0)
    and gray+alpha (4) replicate luminance, palette (3) looks up PLTE,
    RGBA (6) drops alpha. Blobs are hand-built per the public spec."""
    import struct
    import zlib

    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        _PNG_SIG, decode_png)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    def png(color_type, channels, extra=b""):
        # 2x2 image, filter 0 rows, sample value = 10*idx + channel
        h, w = 2, 2
        raw = bytearray()
        v = 0
        for y in range(h):
            raw.append(0)
            for x in range(w):
                for c in range(channels):
                    raw.append((10 * (y * w + x) + c) & 0xFF)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (_PNG_SIG + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b""))

    gray = decode_png(png(0, 1))
    assert gray.shape == (2, 2, 3)
    assert (gray[0, 1] == [10, 10, 10]).all()  # replicated luminance

    ga = decode_png(png(4, 2))
    assert (ga[1, 1] == [30, 30, 30]).all()  # alpha dropped

    rgba = decode_png(png(6, 4))
    assert (rgba[1, 0] == [20, 21, 22]).all()

    plte = chunk(b"PLTE", bytes([255, 0, 0] * 10 + [0, 255, 0] * 10
                                + [0, 0, 255] * 12))
    pal = decode_png(png(3, 1, extra=plte))
    assert (pal[0, 0] == [255, 0, 0]).all()   # index 0
    assert (pal[0, 1] == [0, 255, 0]).all()   # index 10
    assert (pal[1, 0] == [0, 0, 255]).all()   # index 20


def test_png_rejects_corrupt_and_unsupported():
    """CRC damage, truncation, interlace, and 16-bit depth must raise
    (never silently misdecode); stub=True falls back to fake pixels."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        _PNG_SIG, decode_image, decode_png, encode_png)

    rng = np.random.default_rng(3).integers(0, 256, (4, 4, 3), np.uint8)
    blob = bytearray(encode_png(rng))
    blob[30] ^= 0xFF  # damage inside IHDR -> CRC mismatch
    with pytest.raises(ValueError):
        decode_png(bytes(blob))
    assert decode_image(bytes(blob), stub=True).shape == (16, 16, 3)

    with pytest.raises(ValueError):
        decode_png(encode_png(rng)[:20])  # truncated

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    interlaced = (_PNG_SIG
                  + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
                  + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(interlaced)
    deep = (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
            + chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth"):
        decode_png(deep)


def test_image_features_on_real_png(spark):
    """The mapInPandas feature path over an actual PNG blob: constant
    color survives pooling exactly."""
    import numpy as np

    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA, encode_png, image_features)

    px = np.full((8, 8, 3), 0, np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 200, 100, 50
    media = spark.createDataFrame(
        [("m1", "image", bytearray(encode_png(px)), "image/png", 8, 8, None)],
        MEDIA_SCHEMA)
    row = image_features(media, stub=False).collect()[0]
    assert (row.mean_r, row.mean_g, row.mean_b) == (200.0, 100.0, 50.0)
