"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference's Document model reserves a ``media: list`` slot
(pipelines/finemath/main.py:60-66) but never processes media. A 100 TB
pretraining pipeline does; this module supplies the engine's multimodal
surface with REAL Spark plumbing — schemas, Arrow batch shapes,
mapInPandas signatures, partitioning. Codecs: BMP, binary netpbm,
8-bit PNG, baseline JPEG (operators/jpeg.py — r11) and PCM WAV decode
FOR REAL with stdlib+numpy; everything else (progressive JPEG, WebP,
MP3, video containers) needs a codec lib not in this container:
``decode_image``/``decode_audio`` raise NotImplementedError unless
``stub=True``, in which case a deterministic fake decoder (seeded by
content hash) produces shaped arrays so the downstream plumbing is
testable end-to-end.

Scale notes:
- media bytes travel in a BINARY column; all transforms are
  ``mapInPandas`` so bytes move driver-free in Arrow batches.
- `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory —
  set it low (e.g. 64) for video, media rows are MBs not KBs.
- feature outputs are small typed columns → downstream joins/filters
  never touch the blob again (project early, scan-prune on re-read).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: media row schema: one blob + typed metadata (FIXTURES-style convention).
MEDIA_SCHEMA = (
    "media_id string, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)


def _fake_pixels(content: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: pixels derived from the content digest —
    stable across executors/retries, no codec needed. DIGEST-TWIN form
    (round 7, the A6/A7 oracle pattern): pixel k (row-major,
    channel-minor) is ``(md5(content)[k % 16] + k) % 256`` — closed-form
    arithmetic over the digest bytes, so a DuckDB oracle can replay the
    whole decode → pool → feature chain from
    ``('0x' || substr(md5(...), i, 2))`` and hash-check the mapInPandas
    plumbing despite no codec (q_multimodal_image_features,
    q_multimodal_frame_sample)."""
    digest = np.frombuffer(hashlib.md5(content).digest(), np.uint8)
    k = np.arange(width * height * 3, dtype=np.int64)
    return ((digest[k % 16].astype(np.int64) + k) % 256).astype(
        np.uint8).reshape(height, width, 3)


def decode_bmp(content: bytes) -> np.ndarray:
    """REAL image decode for uncompressed 24-bit BMP (no codec lib needed
    — the format is a struct-defined pixel grid). Returns HxWx3 uint8 in
    RGB order, top row first.

    Handles the BITMAPINFOHEADER layout: bottom-up rows (positive height)
    or top-down (negative), 4-byte row padding, BGR channel order.
    """
    import struct

    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP blob")
    pixel_off = struct.unpack_from("<I", content, 10)[0]
    header_size = struct.unpack_from("<I", content, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = pixel_off + row_bytes * height
    if len(content) < need:
        raise ValueError(f"truncated BMP: {len(content)} < {need} bytes")
    rows = np.frombuffer(
        content, np.uint8, count=row_bytes * height, offset=pixel_off
    ).reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_wav(content: bytes) -> np.ndarray:
    """REAL audio decode for PCM WAV via the stdlib ``wave`` module:
    returns mono float32 in [-1, 1] (multi-channel input is averaged)."""
    import io
    import wave

    with wave.open(io.BytesIO(content)) as w:
        n = w.getnframes()
        raw = w.readframes(n)
        width = w.getsampwidth()
        channels = w.getnchannels()
    if width == 2:
        pcm = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        pcm = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        pcm = pcm.reshape(-1, channels).mean(axis=1)
    return pcm



def decode_netpbm(content: bytes) -> np.ndarray:
    """REAL image decode for binary netpbm: P5 (grayscale PGM) and P6
    (RGB PPM), maxval <= 255 — like BMP, a struct-defined pixel grid
    needing no codec lib. Returns HxWx3 uint8 (grayscale replicated
    across channels so every decoder in this module shares one shape
    contract).

    Header = magic, whitespace/comment-separated width height maxval,
    ONE whitespace byte, then raw samples.
    """
    if len(content) < 2 or content[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm blob")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if pos < len(content) and content[pos : pos + 1] == b"#":  # comment
            nl = content.find(b"\n", pos)
            if nl == -1:
                raise ValueError("truncated netpbm header")
            pos = nl + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        fields.append(int(content[start:pos]))
    pos += 1  # exactly one whitespace byte after maxval
    width, height, maxval = fields
    if not (0 < maxval <= 255) or width <= 0 or height <= 0:
        raise ValueError(f"unsupported netpbm geometry {fields}")
    ch = 3 if content[:2] == b"P6" else 1
    need = width * height * ch
    if len(content) < pos + need:
        raise ValueError(f"truncated netpbm: {len(content)} < {pos + need}")
    px = np.frombuffer(content, np.uint8, count=need, offset=pos)
    if ch == 1:
        return np.repeat(px.reshape(height, width, 1), 3, axis=2).copy()
    return px.reshape(height, width, 3).copy()


#: PNG file signature (8 bytes, public spec).
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left) — spec §9, Filtering."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunks(content: bytes):
    """Yield (type, data) for each PNG chunk, CRC-verified."""
    import struct
    import zlib

    pos = len(_PNG_SIG)
    while pos + 8 <= len(content):
        length, ctype = struct.unpack_from(">I4s", content, pos)
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(content):
            raise ValueError("truncated PNG chunk")
        crc = struct.unpack_from(">I", content, pos + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND")


def decode_png(content: bytes) -> np.ndarray:
    """REAL PNG decode, pure stdlib (zlib inflate + per-scanline
    unfilter) — PNG is the one compressed image format whose codec is
    feasible without an image library, because its compression IS zlib
    and its only other moving part is the 5-filter scanline predictor.
    Supports the common web subset: 8-bit depth, color types 0 (gray),
    2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced.
    Returns HxWx3 uint8 RGB (alpha dropped, gray replicated) — the one
    shape contract every decoder in this module shares.

    Unfiltering (r12): None/Up are whole-row numpy; Sub is an exact
    mod-256 cumulative sum over the pixel axis (byte addition mod 256
    is associative, so the prefix-sum IS the left-to-right recurrence);
    Average/Paeth are genuinely sequential (each byte needs the
    reconstructed left byte through a floor-divide / branch) and run as
    plain-int Python loops over lists — ~10x over the previous
    numpy-scalar-indexing loop, byte-identical output. A deployment
    decoding full-resolution corpora plugs a real codec via
    ``codec_factory`` (docs/model_plugins.md).
    """
    import struct
    import zlib

    if not content.startswith(_PNG_SIG):
        raise ValueError("not a PNG blob")
    width = height = None
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(content):
        if ctype == b"IHDR":
            width, height, depth, ctype_code, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or comp != 0 or filt != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, comp={comp})")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG unsupported")
            color_type = ctype_code
        elif ctype == b"PLTE":
            palette = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG data length {len(raw)} != {(stride + 1) * height}")
    bpp = channels
    out = np.zeros((height, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    pos = 0
    for y in range(height):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int32)
        pos += stride + 1
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:  # Sub: exact vectorization — recon[i] = (x[i] +
            # recon[i-bpp]) mod 256 is a prefix sum along each of the
            # bpp byte lanes, and mod-256 addition is associative, so
            # cumsum-then-mask reproduces the recurrence byte-for-byte
            cur = (line.reshape(-1, bpp).cumsum(axis=0,
                                                dtype=np.int64) & 0xFF
                   ).astype(np.int32).reshape(stride)
        elif f in (3, 4):  # Average / Paeth: the floor-divide / branch
            # makes the left-dependence non-associative — sequential by
            # nature. Plain-int list loop (no numpy scalar indexing).
            cur_l = line.tolist()
            prev_l = prev.tolist()
            if f == 3:
                for i in range(stride):
                    left = cur_l[i - bpp] if i >= bpp else 0
                    cur_l[i] = (cur_l[i] + ((left + prev_l[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    left = cur_l[i - bpp] if i >= bpp else 0
                    up = prev_l[i]
                    ul = prev_l[i - bpp] if i >= bpp else 0
                    p = left + up - ul
                    pa = p - left if p >= left else left - p
                    pb = p - up if p >= up else up - p
                    pc = p - ul if p >= ul else ul - p
                    if pa <= pb and pa <= pc:
                        pred = left
                    elif pb <= pc:
                        pred = up
                    else:
                        pred = ul
                    cur_l[i] = (cur_l[i] + pred) & 0xFF
            cur = np.asarray(cur_l, dtype=np.int32)
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, channels)
    if color_type == 2:
        return px.copy()
    if color_type == 6:
        return px[:, :, :3].copy()
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        return palette[px[:, :, 0]]
    # gray / gray+alpha: replicate luminance
    return np.repeat(px[:, :, :1], 3, axis=2).copy()


def encode_png(pixels: "np.ndarray", filter_mode: str = "cycle") -> bytes:
    """REAL PNG encoder (8-bit RGB, color type 2, non-interlaced) — the
    inverse of decode_png, giving the compressed-image path a true
    round-trip oracle. ``filter_mode="cycle"`` filters row y with type
    y % 5, so one encoded image exercises EVERY unfilter branch of the
    decoder (None/Sub/Up/Average/Paeth); "none" emits filter 0 rows.
    Input HxWx3 uint8 RGB."""
    import struct
    import zlib

    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_png wants HxWx3 uint8 RGB")
    bpp = 3
    stride = w * bpp
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = flat[y]
        f = y % 5 if filter_mode == "cycle" else 0
        raw.append(f)
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif f == 2:  # Up
            enc = (cur - prev) & 0xFF
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth — vectorized exactly: unlike DECODE, the encoder
            # predicts from the RAW left/up/up-left bytes (all known
            # arrays up front), so the whole row is elementwise numpy;
            # the np.where cascade mirrors _paeth's tie-break order
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) & 0xFF
        raw += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def decode_image(content: bytes, stub: bool = False) -> np.ndarray:
    """Decode an image blob to HxWx3 uint8. Uncompressed 24-bit BMP,
    binary netpbm (P5/P6), 8-bit non-interlaced PNG, and baseline
    sequential JPEG (operators/jpeg.py) decode FOR REAL (struct-defined
    grids / stdlib-zlib / own entropy+IDCT — no codec lib needed);
    other formats need a real codec (PIL/cv2, not in this container) —
    STUB: deterministic fake pixels when stub=True.

    stub=True GUARANTEES non-raising: a blob that merely starts with
    'BM' but is not a valid BMP (e.g. text beginning 'BMW …') falls back
    to the stub instead of failing the task."""
    if len(content) >= 2 and content[:2] == b"BM":
        try:
            return decode_bmp(content)
        except ValueError:
            if not stub:
                raise
    if len(content) >= 2 and content[:2] in (b"P5", b"P6"):
        try:
            return decode_netpbm(content)
        except ValueError:
            if not stub:
                raise
    if content.startswith(_PNG_SIG):
        try:
            return decode_png(content)
        except Exception:  # ValueError, zlib.error
            if not stub:
                raise
    if content[:2] == b"\xff\xd8":
        # baseline AND progressive JPEG decode FOR REAL
        # (operators/jpeg.py — r11/r12); the formats it rejects loudly
        # (arithmetic/hierarchical/12-bit) fall to the stub under
        # stub=True like every other codec here
        from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
            decode_jpeg,
        )

        try:
            return decode_jpeg(content)
        except Exception:  # ValueError, NotImplementedError, struct.error
            if not stub:
                raise
    if not stub:
        raise NotImplementedError(
            "only BMP, binary netpbm (PGM/PPM), 8-bit PNG, and baseline "
            "JPEG decode without a codec lib in this environment"
        )
    return _fake_pixels(content, 16, 16)


def decode_audio(content: bytes, stub: bool = False) -> np.ndarray:
    """Decode an audio blob to float32 PCM. RIFF/WAV decodes FOR REAL via
    the stdlib wave module; other formats are stubbed like decode_image —
    and like it, stub=True never raises (a RIFF container that isn't PCM
    WAV, e.g. WebP/AVI, falls back to the stub)."""
    if len(content) >= 4 and content[:4] == b"RIFF":
        try:
            return decode_wav(content)
        except Exception:  # wave.Error, EOFError, struct errors
            if not stub:
                raise
    elif not stub:
        raise NotImplementedError(
            "only WAV decodes without a codec lib in this environment"
        )
    seed = int.from_bytes(hashlib.md5(content).digest()[:4], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(1600).astype(np.float32)


def image_features(df: DataFrame, stub: bool = True,
                   target: tuple[int, int] = (8, 8),
                   codec_factory=None, cache_key: str | None = None) -> DataFrame:
    """Decode → resize (mean-pool) → per-channel mean features.

    Output: (media_id, out_width, out_height, mean_r, mean_g, mean_b).
    mapInPandas: each Arrow batch decodes executor-side; the binary column
    is dropped from the output so nothing re-serializes the blobs.

    ``codec_factory() -> decode(bytes) -> HxWx3 uint8 array`` plugs in a
    real codec (PIL/cv2), built once per worker (docs/model_plugins.md);
    default is the deterministic stub decoder.
    """
    schema = (
        "media_id string, out_width int, out_height int, "
        "mean_r double, mean_g double, mean_b double"
    )
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.operators.annotators import executor_singleton

        decode = (executor_singleton(codec_factory, cache_key) if codec_factory is not None
                  else (lambda b: decode_image(b, stub=stub)))
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"].to_numpy(), pdf["content"].to_numpy()):
                if content is None:
                    # missing blob -> NULL features, not fabricated ones
                    out.append((mid, None, None, None, None, None))
                    continue
                px = decode(bytes(content))
                # mean-pool resize to (th, tw): crop to a multiple, reshape
                h, w = px.shape[:2]
                px = px[: h - h % th, : w - w % tw]
                pooled = px.reshape(th, h // th, tw, w // tw, 3).mean(axis=(1, 3))
                means = pooled.mean(axis=(0, 1))
                out.append(
                    (mid, tw, th, float(means[0]), float(means[1]), float(means[2]))
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "out_width", "out_height", "mean_r", "mean_g", "mean_b"],
            )

    return df.select("media_id", "content").mapInPandas(run, schema)


def audio_features(df: DataFrame, stub: bool = True,
                   codec_factory=None, cache_key: str | None = None) -> DataFrame:
    """Decode → RMS energy + zero-crossing-rate features.
    ``codec_factory() -> decode(bytes) -> float32 PCM array`` plugs in a
    real decoder (soundfile/librosa), built once per worker."""
    schema = "media_id string, rms double, zcr double, n_samples int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.operators.annotators import executor_singleton

        decode = (executor_singleton(codec_factory, cache_key) if codec_factory is not None
                  else (lambda b: decode_audio(b, stub=stub)))
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"].to_numpy(), pdf["content"].to_numpy()):
                if content is None:
                    out.append((mid, None, None, None))
                    continue
                pcm = decode(bytes(content))
                rms = float(np.sqrt(np.mean(pcm**2)))
                zcr = float(np.mean(np.abs(np.diff(np.signbit(pcm).astype(np.int8)))))
                out.append((mid, rms, zcr, len(pcm)))
            yield pd.DataFrame(out, columns=["media_id", "rms", "zcr", "n_samples"])

    return df.select("media_id", "content").mapInPandas(run, schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000, stub: bool = True,
                        codec_factory=None, cache_key: str | None = None,
                        hex_digest: bool = False) -> DataFrame:
    """Frame-sample: one output row per sampled frame (1→n fan-out inside
    mapInPandas — the UDTF shape). Frame pixels stay executor-side; the
    output carries frame index + timestamp + a per-frame content digest.
    ``codec_factory() -> extract(bytes, ts_ms) -> HxWx3 uint8 frame``
    plugs in a real demuxer (pyav/ffmpeg), built once per worker.

    ``hex_digest=True`` fingerprints the frame as md5 of the HEX of its
    bytes (instead of the raw bytes) — same identity semantics, but
    replayable by a DuckDB oracle (whose md5 only takes VARCHAR); the
    stub seed is likewise ``content + ascii(ts)`` so the seed stays
    valid UTF-8 for the SQL twin."""
    schema = "media_id string, frame_idx int, ts_ms int, frame_digest string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.operators.annotators import executor_singleton

        if codec_factory is not None:
            extract = executor_singleton(codec_factory, cache_key)
        elif stub:
            extract = lambda b, ts: _fake_pixels(
                b + str(ts).encode("ascii"), 8, 8)
        else:
            raise NotImplementedError(
                "no video codec in this environment — pass codec_factory "
                "(docs/model_plugins.md) or stub=True"
            )
        for pdf in batches:
            out = []
            for mid, dur, content in zip(pdf["media_id"].to_numpy(),
                                         pdf["duration_ms"].to_numpy(),
                                         pdf["content"].to_numpy()):
                if content is None:
                    continue  # no blob -> no frames to sample
                duration = int(dur or 0)
                content = bytes(content)
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    frame = extract(content, ts)
                    payload = (frame.tobytes().hex().encode("ascii")
                               if hex_digest else frame.tobytes())
                    digest = hashlib.md5(payload).hexdigest()
                    out.append((mid, i, ts, digest))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "ts_ms", "frame_digest"]
            )

    return df.select("media_id", "duration_ms", "content").mapInPandas(run, schema)


def attach_media(docs: DataFrame, media: DataFrame, doc_media_map: DataFrame) -> DataFrame:
    """Join typed media *features* (never blobs) back onto documents via a
    (doc_id, media_id) link table — the layout that keeps the 100 TB blob
    store out of every text-side query plan."""
    return docs.join(doc_media_map, "doc_id", "left").join(media, "media_id", "left")


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """REAL BMP encoder (24-bit uncompressed, BITMAPINFOHEADER,
    bottom-up rows, 4-byte padding) — the inverse of decode_bmp, giving
    the binary-media path a true round-trip: synthesize → encode →
    decode must reproduce pixels bit-exactly (pytest + the
    q_bmp_roundtrip closed-form oracle). Input HxWx3 uint8 RGB."""
    import struct

    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("encode_bmp wants HxWx3 RGB")
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + rows.tobytes()


def dhash_pixels(pixels: "np.ndarray", hash_w: int = 8,
                 hash_h: int = 8) -> int | None:
    """Difference hash (dHash) of one decoded image — the standard
    perceptual fingerprint for visual near-dup (Krawetz's public
    row-gradient construction): channel-SUM luminance, mean-pool to a
    ``hash_h x (hash_w + 1)`` grid, bit (i, j) set iff cell (i, j+1) is
    strictly brighter than cell (i, j). Survives recompression
    (BMP→PNG, JPEG quality changes), uniform brightness shifts, and
    small resizes — the edits that defeat byte-digest dedup — while a
    content edit flips the bits whose local gradients it crosses.

    Exactness contract (what the q_image_near_dup oracle replays):
    luminance is the integer channel sum (no float luma weights), the
    image is cropped to cell-size multiples, and cells compare by
    integer SUM — equal cell areas make sum-compare equivalent to
    mean-compare with zero float arithmetic anywhere, so the 64-bit
    hash is closed-form integer arithmetic over the pixel grid.

    Returns a SIGNED 64-bit value for ``hash_w*hash_h = 64`` (bit 63 in
    two's complement — xor/bit_count Hamming arithmetic acts on the raw
    pattern), or None for images smaller than the cell grid (no crash
    on thumbnails; callers drop NULL fingerprints)."""
    cw = hash_w + 1
    gray = pixels.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < hash_h or w < cw:
        return None
    gray = gray[: h - h % hash_h, : w - w % cw]
    ch, cwid = gray.shape[0] // hash_h, gray.shape[1] // cw
    cells = gray.reshape(hash_h, ch, cw, cwid).sum(axis=(1, 3))
    bits = cells[:, 1:] > cells[:, :-1]
    v = 0
    for i in range(hash_h):
        for j in range(hash_w):
            if bits[i, j]:
                v |= 1 << (i * hash_w + j)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def image_dhash(df: DataFrame, hash_w: int = 8, hash_h: int = 8,
                stub: bool = True, codec_factory=None,
                cache_key: str | None = None) -> DataFrame:
    """Perceptual fingerprints for a media frame: decode (real
    BMP/netpbm/PNG path, or a plugged codec, or the deterministic
    stub) → :func:`dhash_pixels`. Output (media_id, dhash) — the blob
    never re-serializes past this projection, so the pair stage that
    follows shuffles 12-byte rows, not images."""
    schema = "media_id string, dhash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.operators.annotators import executor_singleton

        decode = (executor_singleton(codec_factory, cache_key)
                  if codec_factory is not None
                  else (lambda b: decode_image(b, stub=stub)))
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"].to_numpy(),
                                    pdf["content"].to_numpy()):
                if content is None:
                    out.append((mid, None))
                    continue
                out.append((mid, dhash_pixels(decode(bytes(content)),
                                              hash_w, hash_h)))
            # build the hash column as nullable Int64 from the RAW
            # python list: a mixed int/None column handed to the
            # DataFrame constructor becomes float64 on the spot (None
            # -> NaN), silently zeroing the low bits of every
            # |hash| > 2^53 in the batch before Arrow ever sees it
            # (r12 find)
            yield pd.DataFrame({
                "media_id": [m for m, _ in out],
                "dhash": pd.array([h for _, h in out], dtype="Int64"),
            })

    return df.select("media_id", "content").mapInPandas(run, schema)


def warc_image_dhash(records: DataFrame, hash_w: int = 8,
                     hash_h: int = 8, stub: bool = False) -> DataFrame:
    """The crawl→visual-dedup entry stage: read_warc response records
    whose bodies are image bytes → (url, fmt, width, height, dhash) in
    ONE Arrow stage — HTTP body slice (readers.http_body_bytes),
    magic-byte format sniff, decode (decode_image dispatch: real
    BMP/netpbm/PNG/JPEG codecs), exact dims, and :func:`dhash_pixels`,
    all inside a single mapInPandas so the multi-KB image bytes cross
    the Arrow boundary exactly once and only ~40-byte rows come out.
    Caller routes with readers.http_content_type BEFORE this stage
    (text/html records never pay a decode attempt) and keys dedup on a
    media id derived from the url JVM-side after it. Undecodable
    bodies yield NULL dims+hash (fmt still sniffed) rather than
    failing the task — crawls carry truncated bodies; downstream
    near-dup drops NULL hashes by contract."""
    schema = ("url string, fmt string, width int, height int, "
              "dhash long")

    def sniff(b: bytes) -> str:
        if b[:2] == b"BM":
            return "bmp"
        if b[:2] in (b"P5", b"P6"):
            return "netpbm"
        if b.startswith(_PNG_SIG):
            return "png"
        if b[:2] == b"\xff\xd8":
            return "jpeg"
        return "unknown"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.sources.readers import http_body_bytes

        for pdf in batches:
            out = []
            for url, content in zip(pdf["url"].to_numpy(),
                                    pdf["content"].to_numpy()):
                body = http_body_bytes(bytes(content))
                fmt = sniff(body)
                try:
                    px = decode_image(body, stub=stub)
                except Exception:
                    out.append((url, fmt, None, None, None))
                    continue
                out.append((url, fmt, int(px.shape[1]), int(px.shape[0]),
                            dhash_pixels(px, hash_w, hash_h)))
            # nullable Int64/Int32 built from the RAW lists, never via
            # the DataFrame constructor: a mixed int/None column
            # becomes float64 on the spot, silently zeroing the low
            # bits of any |hash| > 2^53 in the batch (r12 find —
            # 40/142 fixture hashes corrupted before the fix)
            yield pd.DataFrame({
                "url": [r[0] for r in out],
                "fmt": [r[1] for r in out],
                "width": pd.array([r[2] for r in out], dtype="Int32"),
                "height": pd.array([r[3] for r in out], dtype="Int32"),
                "dhash": pd.array([r[4] for r in out], dtype="Int64"),
            })

    return records.select("url", "content").mapInPandas(run, schema)


def image_near_dup_pairs(df: DataFrame, hash_w: int = 8, hash_h: int = 8,
                         max_hamming: int = 2,
                         max_bucket_size: int | None = None,
                         stub: bool = True, codec_factory=None,
                         cache_key: str | None = None) -> DataFrame:
    """Visual near-duplicate candidate PAIRS: :func:`image_dhash` over
    the decoded media → the shared Manku chunk-bucket machinery
    (dedup.hamming_pairs_from_fingerprints) on the 64-bit hash. Returns
    (id_a, id_b, hamming), id_a < id_b, hamming <= ``max_hamming``.

    Default ``max_bucket_size=None``: with no cap the candidate set is
    provably complete (pigeonhole), which is what the pair-replay
    oracle checks; production corpora with monochrome/templated
    thumbnail floods should set a cap like the text families do.

    Scale: the image bytes are read ONCE (the dhash projection); the
    exchange key is (chunk, value) over 12-byte rows. Completes the
    dedup story for the multimodal columns — the byte-level digests
    (image_features/frame digests) catch exact copies, this catches
    the recompressed/brightness-shifted mirror the digest misses."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import (
        hamming_pairs_from_fingerprints,
    )

    fps = image_dhash(df, hash_w, hash_h, stub, codec_factory,
                      cache_key).filter(F.col("dhash").isNotNull())
    return hamming_pairs_from_fingerprints(
        fps, "media_id", "dhash", hash_w * hash_h, max_hamming,
        max_bucket_size)


def image_near_dup(df: DataFrame, hash_w: int = 8, hash_h: int = 8,
                   max_hamming: int = 2,
                   max_bucket_size: int | None = None,
                   stub: bool = True, codec_factory=None,
                   cache_key: str | None = None) -> DataFrame:
    """End-to-end visual dedup: dHash pairs → the package's standard
    greedy smaller-id-wins resolution (dedup.drop_near_duplicates) →
    kept media rows. The visual member of the dedup family
    (minhash=Jaccard, simhash=cosine-on-shingles, semantic=embedding,
    dhash=pixels)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import drop_near_duplicates

    pairs = image_near_dup_pairs(df, hash_w, hash_h, max_hamming,
                                 max_bucket_size, stub, codec_factory,
                                 cache_key)
    return drop_near_duplicates(df, pairs, "media_id")


def image_dedup_against(new_media: DataFrame, seen_hashes: DataFrame,
                        hash_w: int = 8, hash_h: int = 8,
                        max_hamming: int = 2, stub: bool = True,
                        codec_factory=None,
                        cache_key: str | None = None) -> DataFrame:
    """Incremental VISUAL dedup across snapshots: drop new media whose
    dHash is within ``max_hamming`` of any hash in ``seen_hashes`` (a
    frame exposing ``dhash`` — :func:`image_dhash` output persisted
    from prior months). The monthly-crawl story for images: last
    month's corpus lives on only as 8-byte hashes, the new month's
    blobs decode ONCE, and a re-crawled/recompressed image is dropped
    without either month's pixels crossing the wire again — the visual
    member of the against-store family (exact digests =
    dedup_against, MinHash bands = minhash_dedup_against, dHash =
    this). Returns surviving new_media rows (blob column intact).
    Media too small to hash (NULL dhash) can never be near-dups and
    are KEPT — the drop set is derived, so they are never named in
    it."""
    from metadata_enhanced_pretrain_datapipeline_spark.checkpointing import materialize
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import hamming_dedup_against

    # the hash relation feeds THREE consumers (the chunk probe and the
    # anti-join inside hamming_dedup_against, plus the dropped-set join
    # below) and its subtree is the image DECODE — materialize once so
    # the blobs decode exactly once per action (r13; the boundary inside
    # hamming_dedup_against is a cache no-op on the same plan)
    fps = materialize(
        image_dhash(new_media, hash_w, hash_h, stub, codec_factory,
                    cache_key).filter(F.col("dhash").isNotNull()),
        eager=False)
    kept_ids = hamming_dedup_against(
        fps, seen_hashes.select("dhash"), "media_id", "dhash",
        hash_w * hash_h, max_hamming).select("media_id")
    dropped = fps.select("media_id").join(kept_ids, "media_id",
                                          "left_anti")
    return new_media.join(dropped, "media_id", "left_anti")


def _phash_basis(grid: int = 32, keep: int = 8) -> "np.ndarray":
    """Quantized DCT-II basis for :func:`phash_pixels`: row ``u`` holds
    ``round(cos(pi*(2y+1)*u/(2*grid)) * 1e6)`` for y in [0, grid) — the
    low-``keep`` frequencies of the orthogonal cosine transform, scaled
    to INTEGERS so every downstream multiply/add is exact int64 (no
    libm drift can flip a hash bit between engines). Rounding is
    half-away-from-zero on the exact double (Decimal HALF_UP), matching
    DuckDB's ``round(DOUBLE)`` so the SQL oracle rebuilds the identical
    basis from ``cos(pi()*(2*y+1)*u/(2*grid))*1000000``."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    b = np.empty((keep, grid), dtype=np.int64)
    for u in range(keep):
        for y in range(grid):
            v = math.cos(math.pi * (2 * y + 1) * u / (2 * grid)) * 1000000
            b[u, y] = int(Decimal(v).quantize(Decimal(1),
                                              rounding=ROUND_HALF_UP))
    return b


def phash_pixels(pixels: "np.ndarray", grid: int = 32,
                 keep: int = 8) -> int | None:
    """Perceptual DCT hash (pHash) of one decoded image — the
    frequency-domain twin of :func:`dhash_pixels` (Krawetz's public
    construction): channel-SUM luminance, mean-pool to a
    ``grid x grid`` raster, 2-D DCT-II, keep the ``keep x keep``
    lowest-frequency block, bit (u, v) set iff coefficient (u, v)
    exceeds the mean of the 63 AC coefficients. Because the hash reads
    only low spatial frequencies of an aspect-normalized raster, it
    additionally survives RESCALING — the common re-upload transform
    that shifts every dHash cell boundary — on top of dHash's
    recompression/brightness coverage.

    Exactness contract (what the q_image_phash_near_dup oracle
    replays): luminance is the integer channel sum; the raster is the
    ADAPTIVE mean-pool — cell (i, j) covers rows [i*h//grid,
    (i+1)*h//grid) x the analogous columns (floor boundaries cover the
    WHOLE image at any size; cropping to multiples instead would drop
    up to grid-1 trailing rows/cols and break rescale robustness —
    measured: an 80x80 nearest-neighbor rescale of a smooth 64x64 image
    hashed 21 bits away under crop, 0-2 under adaptive pooling) — and
    each cell is the FLOOR-DIVIDED mean ``sum // area`` (bounding cell
    values <= 765 so the transform fits int64 at any image size); the
    DCT uses the quantized integer basis of :func:`_phash_basis`; the
    AC-mean comparison is the exact integer cross-multiplication
    ``63 * C[u,v] > sum(AC)`` evaluated in unbounded Python ints (the
    63x product can exceed int64 — never wrapped silently). Zero float
    arithmetic anywhere. At exact-multiple sizes (the oracle fixture's
    64x64 and 128x128) adaptive pooling coincides with uniform
    ``(h//grid) x (w//grid)`` cells, so the SQL replay stays ``y//2``
    / ``y//4`` arithmetic.

    Returns a SIGNED 64-bit value for ``keep*keep = 64`` (bit 63 in
    two's complement, same packing as dHash so the Manku chunk-bucket
    machinery applies unchanged), or None for images smaller than
    ``grid x grid``."""
    gray = pixels.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < grid or w < grid:
        return None
    integ = np.zeros((h + 1, w + 1), dtype=np.int64)
    integ[1:, 1:] = gray.cumsum(axis=0).cumsum(axis=1)
    yb = (np.arange(grid + 1) * h) // grid
    xb = (np.arange(grid + 1) * w) // grid
    sums = (integ[yb[1:, None], xb[None, 1:]]
            - integ[yb[:-1, None], xb[None, 1:]]
            - integ[yb[1:, None], xb[None, :-1]]
            + integ[yb[:-1, None], xb[None, :-1]])
    areas = (yb[1:] - yb[:-1])[:, None] * (xb[1:] - xb[:-1])[None, :]
    cells = sums // areas
    basis = _phash_basis(grid, keep)
    coef = basis @ cells @ basis.T  # exact: |C| <= grid^2 * 765 * 1e12
    cl = coef.tolist()  # python ints: the 63x compare below may exceed int64
    sum_ac = sum(c for row in cl for c in row) - cl[0][0]
    v = 0
    for u in range(keep):
        for j in range(keep):
            if 63 * cl[u][j] > sum_ac:
                v |= 1 << (u * keep + j)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def strip_uniform_border(pixels: "np.ndarray") -> "np.ndarray":
    """Strip letterbox/pillarbox bars before perceptual hashing: crop
    consecutive UNIFORM rows from the top/bottom and uniform columns
    from the left/right edges (a row/column is uniform when every pixel
    equals its first pixel — bars are one flat color; no tolerance, so
    the rule replays exactly in the oracle). Letterboxing shifts every
    low-frequency DCT coefficient (the bars ARE low-frequency content),
    so an un-stripped pHash of a letterboxed re-upload lands far from
    the original; stripping first restores the bit-identical raster
    for bar heights that are cell-multiples and a near-zero Hamming
    distance otherwise. A fully-uniform image (nothing would remain)
    is returned unchanged — blank media should hash as blank, not
    crash. Integer compares only; O(h*w) numpy, runs inside the decode
    stage."""
    h, w, _ = pixels.shape
    row_u = (pixels == pixels[:, :1, :]).all(axis=(1, 2))
    col_u = (pixels == pixels[:1, :, :]).all(axis=(0, 2))
    top = int(np.argmin(row_u)) if not row_u.all() else h
    bot = int(np.argmin(row_u[::-1])) if not row_u.all() else 0
    left = int(np.argmin(col_u)) if not col_u.all() else w
    right = int(np.argmin(col_u[::-1])) if not col_u.all() else 0
    if top + bot >= h or left + right >= w:
        return pixels
    return pixels[top:h - bot, left:w - right]


def image_phash(df: DataFrame, grid: int = 32, keep: int = 8,
                stub: bool = True, codec_factory=None,
                cache_key: str | None = None,
                strip_border: bool = False) -> DataFrame:
    """DCT perceptual fingerprints for media frames: decode (real
    BMP/netpbm/PNG path, plugged codec, or deterministic stub) →
    :func:`phash_pixels`. Output (media_id, phash) — same 12-byte
    projection contract as :func:`image_dhash`: blobs decode once and
    never re-serialize past this point. ``strip_border=True`` runs
    :func:`strip_uniform_border` between decode and hash — the
    letterboxed-re-upload mode."""
    schema = "media_id string, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.operators.annotators import executor_singleton

        decode = (executor_singleton(codec_factory, cache_key)
                  if codec_factory is not None
                  else (lambda b: decode_image(b, stub=stub)))
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"].to_numpy(),
                                    pdf["content"].to_numpy()):
                if content is None:
                    out.append((mid, None))
                    continue
                px = decode(bytes(content))
                if strip_border:
                    px = strip_uniform_border(px)
                out.append((mid, phash_pixels(px, grid, keep)))
            # nullable Int64 from the raw list — same constructor
            # float64-degradation hazard as image_dhash (r12 find)
            yield pd.DataFrame({
                "media_id": [m for m, _ in out],
                "phash": pd.array([h for _, h in out], dtype="Int64"),
            })

    return df.select("media_id", "content").mapInPandas(run, schema)


def image_phash_near_dup_pairs(df: DataFrame, grid: int = 32,
                               keep: int = 8, max_hamming: int = 2,
                               max_bucket_size: int | None = None,
                               stub: bool = True, codec_factory=None,
                               cache_key: str | None = None,
                               strip_border: bool = False) -> DataFrame:
    """Visual near-duplicate candidate PAIRS on the DCT hash:
    :func:`image_phash` → dedup.hamming_pairs_from_fingerprints, the
    exact machinery (and exact scale shape — one (chunk, value)
    exchange over 12-byte rows) as the dHash pairs. Returns
    (id_a, id_b, hamming), id_a < id_b, hamming <= ``max_hamming``.
    Use this variant when the corpus contains RESCALED re-uploads
    (thumbnails, responsive-image variants); dHash remains the cheaper
    choice when sizes are normalized upstream. Same bucket-cap
    contract: None = pigeonhole-complete, set a cap for templated
    floods."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import (
        hamming_pairs_from_fingerprints,
    )

    fps = image_phash(df, grid, keep, stub, codec_factory,
                      cache_key, strip_border).filter(
                          F.col("phash").isNotNull())
    return hamming_pairs_from_fingerprints(
        fps, "media_id", "phash", keep * keep, max_hamming,
        max_bucket_size)


def video_near_dup_pairs(media: DataFrame, every_ms: int = 1000,
                         min_jaccard: float = 0.5,
                         max_bucket_size: int | None = 256,
                         stub: bool = True, codec_factory=None,
                         cache_key: str | None = None) -> DataFrame:
    """Visual near-dup for VIDEO: two videos are near-duplicates when
    their sampled frames largely coincide — re-encoded, re-containered,
    or head/tail-trimmed uploads share most frame digests while
    distinct footage shares none. Composition of two proven pieces:
    :func:`sample_video_frames` (1 frame per ``every_ms``, digest per
    frame — blobs decode once) feeds
    dedup.token_set_jaccard_pairs over (media_id, frame_digest).
    Returns (id_a, id_b, jaccard >= min_jaccard).

    Frame digests are EXACT-match tokens, so this catches
    bit-identical frame streams (container/metadata changes, trims);
    recompressed-per-frame video needs a perceptual per-frame hash —
    plug a real extractor via ``codec_factory`` and compose
    :func:`dhash_pixels` per frame, then band the hashes like
    :func:`image_near_dup_pairs` (the Spark shape is identical; only
    the token column changes)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import token_set_jaccard_pairs

    frames = sample_video_frames(media, every_ms, stub, codec_factory,
                                 cache_key)
    return token_set_jaccard_pairs(
        frames.select("media_id", "frame_digest"), "media_id",
        "frame_digest", min_jaccard, max_bucket_size)


def video_near_dup(media: DataFrame, every_ms: int = 1000,
                   min_jaccard: float = 0.5,
                   max_bucket_size: int | None = 256,
                   stub: bool = True, codec_factory=None,
                   cache_key: str | None = None) -> DataFrame:
    """End-to-end video dedup: frame-overlap pairs → standard
    smaller-id-wins resolution → kept media rows."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import drop_near_duplicates

    pairs = video_near_dup_pairs(media, every_ms, min_jaccard,
                                 max_bucket_size, stub, codec_factory,
                                 cache_key)
    return drop_near_duplicates(media, pairs, "media_id")


def audio_window_energies(df: DataFrame, window_samples: int = 1024,
                          segments: int = 32, stub: bool = True,
                          codec_factory=None,
                          cache_key: str | None = None) -> DataFrame:
    """Per-window segment energies — the decode half of the audio
    fingerprint, split from the arithmetic half
    (:func:`energy_fingerprint`) so the bit-packing is a pure Spark
    expression an oracle can replay. Each blob decodes ONCE
    (mapInPandas); PCM truncates to whole ``window_samples`` windows;
    each window splits into ``segments`` equal chunks and emits the
    chunk energies (Σ sample², float64) as one row:
    (media_id, win_idx, energies array<double>).

    ``codec_factory() -> decode(bytes) -> float PCM`` plugs in a real
    decoder (soundfile/librosa) built once per worker; the default is
    the REAL stdlib WAV path / deterministic stub of
    :func:`decode_audio`.
    """
    if window_samples % segments:
        raise ValueError(
            f"audio_window_energies: window_samples={window_samples} "
            f"must divide into segments={segments}")
    schema = "media_id string, win_idx int, energies array<double>"
    seg_len = window_samples // segments

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from metadata_enhanced_pretrain_datapipeline_spark.operators.annotators import executor_singleton

        decode = (executor_singleton(codec_factory, cache_key)
                  if codec_factory is not None
                  else (lambda b: decode_audio(b, stub=stub)))
        for pdf in batches:
            out_mid, out_w, out_en = [], [], []
            for mid, content in zip(pdf["media_id"].to_numpy(),
                                    pdf["content"].to_numpy()):
                if content is None:
                    continue  # no blob -> no windows
                pcm = np.asarray(decode(bytes(content)), dtype=np.float64)
                n_win = len(pcm) // window_samples
                if not n_win:
                    continue
                chunks = pcm[: n_win * window_samples].reshape(
                    n_win, segments, seg_len)
                energies = (chunks * chunks).sum(axis=2)
                for w in range(n_win):
                    out_mid.append(mid)
                    out_w.append(w)
                    out_en.append(list(energies[w]))
            yield pd.DataFrame(
                {"media_id": out_mid, "win_idx": out_w, "energies": out_en})

    return df.select("media_id", "content").mapInPandas(run, schema)


def energy_fingerprint(energies: Column) -> Column:
    """Haitsma–Kalker-style sign fingerprint (ISMIR'02 "A Highly Robust
    Audio Fingerprinting System" — public algorithm): bit i = 1 iff
    E[i] > E[i+1], packed MSB-first into a BIGINT via a Horner fold
    (acc·2 + bit — no shift-by-column, which pyspark's shiftleft can't
    express). Signs of energy DIFFERENCES are invariant to volume
    scaling and robust to re-encoding; n segments → n−1 bits, so
    segments ≤ 32 keeps the fingerprint well inside ANSI-safe bigint
    range. Pure expression — JVM-side, oracle-replayable as
    Σ bit_i · 2^(n−2−i)."""
    pairs = F.zip_with(
        F.slice(energies, 1, F.size(energies) - 1),
        F.slice(energies, 2, F.size(energies) - 1),
        lambda a, b: F.when(a > b, F.lit(1).cast("long"))
        .otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(pairs, F.lit(0).cast("long"),
                       lambda acc, bit: acc * F.lit(2).cast("long") + bit)


def audio_fingerprints(df: DataFrame, window_samples: int = 1024,
                       segments: int = 32, stub: bool = True,
                       codec_factory=None,
                       cache_key: str | None = None) -> DataFrame:
    """(media_id, win_idx, fp bigint) — decode + energies + sign-bit
    packing composed. The 8-byte fp column is what an incremental store
    would persist (the audio analogue of the image dHash store)."""
    en = audio_window_energies(df, window_samples, segments, stub,
                               codec_factory, cache_key)
    return en.select("media_id", "win_idx",
                     energy_fingerprint(F.col("energies")).alias("fp"))


def audio_near_dup_pairs(media: DataFrame, min_jaccard: float = 0.5,
                         max_bucket_size: int | None = 256,
                         window_samples: int = 1024, segments: int = 32,
                         stub: bool = True, codec_factory=None,
                         cache_key: str | None = None) -> DataFrame:
    """Audio near-dup: two clips are near-duplicates when their window
    fingerprints largely coincide — volume-normalized, re-containered,
    channel-remixed, or window-aligned-trimmed uploads share most
    fingerprints (sign-of-energy-difference bits survive all of those)
    while distinct recordings share none. Same engine as video:
    :func:`audio_fingerprints` feeds dedup.token_set_jaccard_pairs over
    (media_id, fp) — constant/silent audio collapses to degenerate
    shared fingerprints, which the bucket cap defuses exactly like the
    black-frame digest case. Returns (id_a, id_b, jaccard)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import token_set_jaccard_pairs

    fps = audio_fingerprints(media, window_samples, segments, stub,
                             codec_factory, cache_key)
    return token_set_jaccard_pairs(
        fps.select("media_id", "fp"), "media_id", "fp",
        min_jaccard, max_bucket_size)


def audio_near_dup(media: DataFrame, min_jaccard: float = 0.5,
                   max_bucket_size: int | None = 256,
                   window_samples: int = 1024, segments: int = 32,
                   stub: bool = True, codec_factory=None,
                   cache_key: str | None = None) -> DataFrame:
    """End-to-end audio dedup: fingerprint-overlap pairs → standard
    smaller-id-wins resolution → kept media rows."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import drop_near_duplicates

    pairs = audio_near_dup_pairs(media, min_jaccard, max_bucket_size,
                                 window_samples, segments, stub,
                                 codec_factory, cache_key)
    return drop_near_duplicates(media, pairs, "media_id")


def audio_dedup_against(new_media: DataFrame, seen_fps: DataFrame,
                        min_jaccard: float = 0.5,
                        max_bucket_size: int | None = 256,
                        window_samples: int = 1024, segments: int = 32,
                        stub: bool = True, codec_factory=None,
                        cache_key: str | None = None) -> DataFrame:
    """Incremental audio dedup: the new month's blobs decode once;
    prior months live on as their (media_id, fp) window-fingerprint
    rows (``seen_fps`` — what :func:`audio_fingerprints` emits and a
    store persists). New clips sharing >= ``min_jaccard`` of their
    fingerprints with ANY stored clip drop; the rest survive. Same
    month-over-month shape as :func:`image_dedup_against`, with
    dedup.token_set_jaccard_against as the engine."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import token_set_jaccard_against

    fps = audio_fingerprints(new_media, window_samples, segments, stub,
                             codec_factory, cache_key)
    pairs = token_set_jaccard_against(
        fps.select("media_id", "fp"), seen_fps.select("media_id", "fp"),
        "media_id", "fp", min_jaccard, max_bucket_size)
    dropped = pairs.select(F.col("new_id").alias("media_id")).distinct()
    return new_media.join(dropped, "media_id", "left_anti")


def video_dedup_against(new_media: DataFrame, seen_frames: DataFrame,
                        every_ms: int = 1000, min_jaccard: float = 0.5,
                        max_bucket_size: int | None = 256,
                        stub: bool = True, codec_factory=None,
                        cache_key: str | None = None) -> DataFrame:
    """Incremental video dedup against a persisted (media_id,
    frame_digest) store — :func:`video_near_dup`'s month-over-month
    form (the store is what :func:`sample_video_frames` emits)."""
    from metadata_enhanced_pretrain_datapipeline_spark.operators.dedup import token_set_jaccard_against

    frames = sample_video_frames(new_media, every_ms, stub, codec_factory,
                                 cache_key)
    pairs = token_set_jaccard_against(
        frames.select("media_id", "frame_digest"),
        seen_frames.select("media_id", "frame_digest"),
        "media_id", "frame_digest", min_jaccard, max_bucket_size)
    dropped = pairs.select(F.col("new_id").alias("media_id")).distinct()
    return new_media.join(dropped, "media_id", "left_anti")
