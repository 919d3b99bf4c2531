"""The multimodal crawl front door (q_crawl_to_media) and the
assumptions its oracle rests on: JPEG re-encode determinism, the
measured dHash separation margin, and the fused WARC->decode->hash
stage including content-type routing and undecodable pass-through."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
)
from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
    decode_image,
    dhash_pixels,
)
from metadata_enhanced_pretrain_datapipeline_spark.queries import (
    _media_blob,
    _media_pixels,
)


def test_reencode_twin_decodes_identical():
    """The `_r` twin contract: a restart-interval re-encode has
    DIFFERENT bytes but IDENTICAL quantized coefficients, so the
    decode is pixel-identical (restart markers only reset the DC
    predictor and re-segment the bitstream; every reconstructed value
    is unchanged). This is what makes the JPEG near-dup decisions in
    q_crawl_to_media's oracle structural rather than replayed."""
    for did in (12, 42, 102, 162, 282):
        px = _media_pixels(did, 24).astype(np.uint8)
        b0 = encode_jpeg(px, quality=85, subsample=(did % 20 == 2),
                         restart_interval=0)
        b2 = encode_jpeg(px, quality=85, subsample=(did % 20 == 2),
                         restart_interval=2)
        assert b0 != b2
        assert np.array_equal(decode_jpeg(b0), decode_jpeg(b2))


def test_jpeg_hash_separation():
    """The oracle's ONE unverifiable-in-SQL assumption, pinned here
    over the ENTIRE sf0.1 did range (a superset of sf0.001/sf0.01):
    every dHash pair involving at least one JPEG-decoded hash is
    strictly beyond the near-dup threshold (2), except the
    structurally-identical groups. The multiplicative-hash pixel
    pattern exists exactly for this — the linear-gradient pattern the
    other image fixtures use collapses to hamming 0 under JPEG q85
    smoothing (measured r12)."""
    dids = list(range(2, 5000, 10))
    jpeg_h = {}
    for did in dids:
        if did % 3 == 0:
            _, blob = _media_blob(did)
            jpeg_h[did] = dhash_pixels(decode_jpeg(blob))
    loss_h = []
    for did in dids:
        if did % 3 == 0:
            continue
        base = _media_pixels(did, 18)
        loss_h.append(dhash_pixels(base.astype(np.uint8)))
        if did % 4 == 0:
            y = np.arange(16).reshape(16, 1, 1)
            x = np.arange(18).reshape(1, 18, 1)
            cb = ((x // 2) + (y // 2)) % 2 == 0
            loss_h.append(dhash_pixels(
                (base + np.where(cb, 17, 0)).astype(np.uint8)))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    mn_jj = min(ham(a, b) for a, b in
                itertools.combinations(jpeg_h.values(), 2))
    mn_jl = min(ham(a, b) for a in jpeg_h.values() for b in loss_h)
    assert mn_jj > 2, f"jpeg-jpeg margin collapsed: {mn_jj}"
    assert mn_jl > 2, f"jpeg-lossless margin collapsed: {mn_jl}"


def test_media_pixels_no_uint8_wrap():
    """Values stay < 199 so the +1 / +17 twin edits never wrap."""
    for did in (2, 12, 4992):
        assert _media_pixels(did, 24).max() <= 198


def test_warc_image_dhash_stage(spark):
    """The fused stage end to end on hand-built records: html routed
    away by content-type BEFORE the stage, image bodies sliced,
    sniffed, decoded, hashed; an undecodable body yields NULL
    dims+hash with fmt still sniffed."""
    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal
    from metadata_enhanced_pretrain_datapipeline_spark.sources import readers, writers

    px = _media_pixels(12, 18).astype(np.uint8)
    recs = [
        ("https://e.com/page1", writers.warc_response_record(
            "https://e.com/page1", "2026-02-01T00:00:00Z",
            "<html><body>decoy</body></html>")),
        ("https://e.com/m12_a", writers.warc_binary_response_record(
            "https://e.com/m12_a", "2026-02-01T00:00:00Z",
            multimodal.encode_bmp(px), "image/bmp")),
        ("https://e.com/m12_u", writers.warc_binary_response_record(
            "https://e.com/m12_u", "2026-02-01T00:00:00Z",
            b"GIF89a garbage", "image/gif")),
    ]
    # strip the WARC envelope the way read_warc does: url + HTTP bytes
    import pandas as pd

    payloads = []
    for url, rec in recs:
        for h, c in readers._iter_warc_records(rec):
            payloads.append((url, bytearray(c)))
    df = spark.createDataFrame(pd.DataFrame(
        payloads, columns=["url", "content"]))
    routed = df.filter(
        readers.http_content_type(F.col("content")).startswith("image/"))
    out = {r.url: r for r in
           multimodal.warc_image_dhash(routed).collect()}
    assert set(out) == {"https://e.com/m12_a", "https://e.com/m12_u"}
    a = out["https://e.com/m12_a"]
    assert (a.fmt, a.width, a.height) == ("bmp", 18, 16)
    assert a.dhash == dhash_pixels(decode_image(
        bytes(multimodal.encode_bmp(px))))
    u = out["https://e.com/m12_u"]
    assert u.fmt == "unknown"
    assert u.width is None and u.dhash is None


def test_http_content_type_strips_params(spark):
    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.sources import readers

    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
            b"charset=UTF-8\r\n\r\n<html></html>")
    df = spark.createDataFrame([(bytearray(http),)], "content binary")
    got = df.select(readers.http_content_type(
        F.col("content")).alias("ct")).head().ct
    assert got == "text/html"


def test_null_hash_in_batch_does_not_corrupt_others(spark):
    """r12 production find: a batch mixing a NULL hash (undecodable or
    too-small media) with real int64 hashes degraded the pandas column
    to float64 at the Arrow boundary, zeroing the low bits of every
    |hash| > 2^53 in that batch. Pin the fix (nullable Int64) on both
    image_dhash and image_phash with a one-partition mixed batch."""
    import pandas as pd

    from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal
    from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import (
        phash_pixels,
    )

    px = _media_pixels(12, 18).astype(np.uint8)
    blob = multimodal.encode_bmp(px)
    df = spark.createDataFrame(
        pd.DataFrame([("a", blob), ("b", None), ("c", blob)],
                     columns=["media_id", "content"])).coalesce(1)
    got = {r.media_id: r.dhash for r in
           multimodal.image_dhash(df, stub=False).collect()}
    assert got == {"a": dhash_pixels(px), "b": None, "c": dhash_pixels(px)}
    gp = {r.media_id: r.phash for r in
          multimodal.image_phash(df, stub=False).collect()}
    assert gp == {"a": phash_pixels(px), "b": None, "c": phash_pixels(px)}


def test_interleave_page_refs_in_document_order():
    """The interleaved page embeds its <img> tags in exactly
    _interleave_refs order — the pos numbering the oracle's refs CTE
    replays — and the extraction regexp recovers them in that order."""
    import re

    from metadata_enhanced_pretrain_datapipeline_spark.queries import (
        _interleave_page,
        _interleave_refs,
    )

    for did in (2, 12, 22, 32, 42, 62, 72, 102, 122, 152, 182, 212):
        page = _interleave_page(did)
        found = re.findall(
            r'<img src="https://img\.example\.com/([^"]+)">', page)
        assert found == _interleave_refs(did), did
        assert found[-1] == f"m{did}_missing"


def test_crawl_interleaved_end_to_end(spark):
    """The composed interleave at sf0.001: per page, kept image ids
    are a subset of the page's refs in page order, the dangling ref
    never appears, the undecodable passthrough appears exactly when
    planted, and a store-month page (did % 20 == 2, did % 30 != 2)
    loses its original."""
    from metadata_enhanced_pretrain_datapipeline_spark.queries import (
        _interleave_refs,
        q_crawl_interleaved,
    )

    rows = q_crawl_interleaved(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        did = int(r.doc_id)
        refs = _interleave_refs(did)
        kept = r.images.split(",") if r.images else []
        assert r.n_refs == len(refs)
        assert r.n_kept == len(kept)
        # subset, in page order
        idx = [refs.index(k) for k in kept]
        assert idx == sorted(idx), (did, kept)
        assert f"m{did}_missing" not in kept
        assert (f"m{did}_u" in kept) == (did % 30 == 2)
        if did % 20 == 2 and did % 30 != 2:
            assert f"m{did}_a" not in kept, did
        assert r.text.startswith(f"Interleaved page {did}\n")
