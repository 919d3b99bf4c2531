"""Scaling probe for the visual dHash near-dup OPERATOR.

The registered q_image_near_dup fixture synthesizes pixels as
``(did·131 + …) % 199`` — closed-form for the oracle, but only ~199
distinct images exist, so at sf10 every dHash repeats ~375× and (with
the fixture's max_bucket_size=None, required for pigeonhole-complete
replay) pair verification goes quadratic: a default-heap OOM at sf10
(.scale/logs/probe_sf10.log). Same adjudication shape as the audio
fixture's mod-97 energies and r8's |Q|∝corpus miner: the FIXTURE's
content variety is constant while the corpus grows; a real crawl's
isn't.

This probe prices the operator as deployed: per-image rng pixels
(deterministic per media id, full variety — no oracle needed here),
planted +1-brightness PNG twins for even ids, REAL stdlib BMP/PNG
encode+decode on both sides, and the DEFAULT bucket cap. Run
back-to-back in fresh JVMs:

    python scripts/image_probe.py .scale/sf1.0
    python scripts/image_probe.py .scale/sf10
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
    spark = get_spark("image-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("doc_id") % 10 == 2).select("doc_id")
         .repartition(32))
    n_docs = d.count()

    def build(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"].to_numpy():
                rng = np.random.default_rng(int(did))
                base = rng.integers(0, 255, (16, 18, 3))
                rows.append((f"m{did}_a",
                             multimodal.encode_bmp(base.astype(np.uint8))))
                if did % 2 == 0:
                    tw = base + 1
                    rows.append((f"m{did}_b",
                                 multimodal.encode_png(tw.astype(np.uint8))))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    def run():
        media = d.mapInPandas(build, "media_id string, content binary")
        multimodal.image_near_dup_pairs(
            media, max_hamming=2, stub=False,
        ).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    laps = timed_laps(run)
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n_docs,
                      "laps": laps, "best": min(laps),
                      "wall": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
