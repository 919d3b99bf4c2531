"""Audio near-dup via energy-sign fingerprints: volume-scaled and
channel-duplicated re-uploads of the SAME recording must share every
window fingerprint and resolve to one row; distinct recordings must not
pair. Exercises the REAL stdlib WAV decode path end to end."""

import io
import wave

import numpy as np
import pytest

from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal


def _wav(samples: np.ndarray, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _samples(seed: int, n: int = 4096) -> np.ndarray:
    # deterministic int16 in [-8000, 8000]: doubling never clips
    rng = np.random.default_rng(seed)
    return rng.integers(-8000, 8000, n, dtype=np.int16)


@pytest.fixture(scope="module")
def media(spark):
    s = _samples(7)
    stereo = np.repeat(s, 2)  # L == R; the decoder's channel-mean == mono
    rows = [
        ("a1", "audio", _wav(s), "audio/wav", None, None, 256),
        ("a1_loud", "audio", _wav(s * 2), "audio/wav", None, None, 256),
        ("a1_stereo", "audio", _wav(stereo, channels=2), "audio/wav",
         None, None, 256),
        ("b1", "audio", _wav(_samples(8)), "audio/wav", None, None, 256),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_fingerprints_invariant_to_volume_and_channels(spark, media):
    fps = multimodal.audio_fingerprints(media, stub=False).collect()
    by_media = {}
    for r in fps:
        by_media.setdefault(r.media_id, {})[r.win_idx] = r.fp
    assert len(by_media["a1"]) == 4  # 4096 samples / 1024 window
    assert by_media["a1"] == by_media["a1_loud"] == by_media["a1_stereo"]
    assert set(by_media["b1"].values()) != set(by_media["a1"].values())


def test_audio_near_dup_pairs_and_resolution(spark, media):
    pairs = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in multimodal.audio_near_dup_pairs(media, stub=False).collect())
    assert pairs == [("a1", "a1_loud", 1.0), ("a1", "a1_stereo", 1.0),
                     ("a1_loud", "a1_stereo", 1.0)]
    kept = sorted(r.media_id
                  for r in multimodal.audio_near_dup(media, stub=False).collect())
    assert kept == ["a1", "b1"]


def test_energy_fingerprint_is_horner_msb_first(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([5.0, 3.0, 4.0, 1.0],)], "energies array<double>")
    # bits: 5>3 -> 1, 3>4 -> 0, 4>1 -> 1 ; MSB-first = 0b101 = 5
    out = df.select(
        multimodal.energy_fingerprint(F.col("energies")).alias("fp")).head()
    assert out.fp == 5


def test_audio_dedup_against_store(spark, media):
    """Prior month lives on as (media_id, fp) rows; a volume-scaled
    re-upload drops against the store, fresh audio survives."""
    seen = multimodal.audio_fingerprints(
        media.filter(media.media_id == "a1"), stub=False)
    new = media.filter(media.media_id.isin("a1_loud", "b1"))
    kept = sorted(r.media_id for r in multimodal.audio_dedup_against(
        new, seen, stub=False).collect())
    assert kept == ["b1"]
