"""Scaling probe for the DCT pHash near-dup OPERATOR.

The registered q_image_phash_near_dup fixture synthesizes pixels as
``(did·131 + …) % 199`` — closed-form for the oracle, but only ~199
distinct 64x64 images exist, so at sf10 every pHash repeats ~250x and
(with the fixture's max_bucket_size=None, required for
pigeonhole-complete replay) pair verification goes quadratic — the
same fixture-variety artifact the dHash fixture showed at sf10 (see
scripts/image_probe.py and SCALE.md round 9). A real crawl's content
variety grows with the corpus; this probe prices the operator as
deployed: per-image rng pixels (deterministic per media id, full
variety), a planted 2x-rescaled +1-brightness PNG twin for even ids
(the transform pHash exists for), REAL stdlib BMP/PNG encode+decode on
both sides, the integer DCT, and the DEFAULT bucket cap 256. Run
back-to-back in fresh JVMs:

    python scripts/phash_probe.py .scale/sf1.0
    python scripts/phash_probe.py .scale/sf10

Letterbox mode (``letterbox`` as the second arg) prices
q_image_phash_letterbox's operator path the same way: the even-id twin
is additionally wrapped in real 8-row black bars (a letterboxed
re-upload), and the near-dup runs with ``strip_border=True`` — the
strip is an O(h*w) integer compare inside the same decode stage, so its
decade row should track the plain pHash row:

    python scripts/phash_probe.py .scale/sf1.0 letterbox
    python scripts/phash_probe.py .scale/sf10 letterbox

JPEG mode (``jpeg``) prices the REAL baseline-JPEG decoder
(operators/jpeg.py) inside the same pipeline: the even-id twin is the
2x-rescaled +1-brightness re-upload ENCODED AS JPEG q95 instead of
PNG, so the decode mapInPandas stage pays the pure-Python entropy +
IDCT cost a JPEG-dominated crawl actually pays. This mode prices
DECODE, not recall: pHash drifts up to 8 bits under q95 re-encode on
adversarial high-frequency content (12 at q90, 21 at q75 — measured
r11), so production JPEG-re-upload matching runs at max_hamming ~8-12
while this probe keeps the default 2 for shape comparability:

    python scripts/phash_probe.py .scale/sf1.0 jpeg
    python scripts/phash_probe.py .scale/sf10 jpeg
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import multimodal
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    mode = sys.argv[2] if len(sys.argv) > 2 else "plain"
    letterbox = mode == "letterbox"
    jpeg = mode == "jpeg"
    spark = get_spark("phash-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("doc_id") % 10 == 7).select("doc_id")
         .repartition(32))
    n_docs = d.count()

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            bars = np.zeros((8, 64, 3), dtype=np.uint8)
            for did in pdf["doc_id"].to_numpy():
                rng = np.random.default_rng(int(did))
                base = rng.integers(0, 255, (64, 64, 3))
                rows.append((f"m{did}_a",
                             multimodal.encode_bmp(base.astype(np.uint8))))
                if did % 2 == 0:
                    tw = np.repeat(np.repeat(base + 0, 2, axis=0), 2,
                                   axis=1)
                    tw = np.clip(tw + 1, 0, 255).astype(np.uint8)
                    if letterbox:
                        tw = np.vstack(
                            [np.repeat(bars, 2, axis=1), tw,
                             np.repeat(bars, 2, axis=1)])
                    if jpeg:
                        from metadata_enhanced_pretrain_datapipeline_spark.operators.jpeg import (
                            encode_jpeg,
                        )

                        blob = encode_jpeg(tw, quality=95, subsample=True)
                    else:
                        blob = multimodal.encode_png(tw)
                    rows.append((f"m{did}_b", blob))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    def run():
        media = d.mapInPandas(build, "media_id string, content binary")
        multimodal.image_phash_near_dup_pairs(
            media, max_hamming=2, max_bucket_size=256, stub=False,
            strip_border=letterbox,
        ).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    laps = timed_laps(run)
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n_docs,
                      "mode": mode,
                      "laps": laps, "best": min(laps),
                      "wall": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
