"""Scaling probe for the audio-fingerprint near-dup OPERATOR.

The registered q_audio_near_dup fixture is built for ORACLE replay, not
for scale: its window energies are taken mod 97, so the fingerprint
TOKEN SPACE is constant while the corpus grows — bucket sizes grow
linearly with the corpus and pair work quadratically (66s at sf1.0 vs
the video fixture's 1.0s on the same engine, whose md5-per-id digests
keep buckets flat). That is the |Q|-grows-with-corpus adjudication
shape (SCALE.md, r8 hard-negative miner), now in token-bucket form —
and the fixture also sets max_bucket_size=None for pigeonhole-complete
replay, disabling the exact guard built for this.

This probe prices the OPERATOR as deployed: fingerprints whose value
space grows with the corpus (base carries the full media id, no small
modulus), planted twins sharing 9/12 windows, and the DEFAULT bucket
cap on. Run back-to-back in fresh JVMs:

    python scripts/audio_probe.py .scale/sf1.0
    python scripts/audio_probe.py .scale/sf10
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup
from metadata_enhanced_pretrain_datapipeline_spark.operators.multimodal import energy_fingerprint
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    spark = get_spark("audio-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = (spark.read.parquet(f"{sf_dir}/documents.parquet")
         .filter(F.col("doc_id") % 11 == 4)
         .select(F.col("doc_id").alias("did")))
    n_media = d.count()

    def run():
        wn = d.select(
            "did", F.explode(F.sequence(F.lit(0), F.lit(11))).alias("w"))
        pair_base = (F.col("did")
                     - 11 * (F.floor((F.col("did") - 4) / 11) % 2)
                     ).cast("long")
        base = F.when(F.col("w") < 9, pair_base).otherwise(
            F.col("did").cast("long"))
        # energies depend on the FULL base id (mod a 31-bit prime only
        # to stay in double-exact range): distinct media produce
        # distinct fingerprints, buckets hold the planted twins alone —
        # the deployed regime, where the corpus grows the token space
        energies = F.transform(
            F.sequence(F.lit(0), F.lit(31)),
            lambda i: ((base * 2654435761 + F.col("w") * 17 + i * 7)
                       % 2147483647).cast("double"))
        fps = wn.select(
            F.concat(F.lit("au"), F.col("did").cast("string"))
            .alias("media_id"),
            energy_fingerprint(energies).alias("fp"))
        dedup.token_set_jaccard_pairs(
            fps, "media_id", "fp", min_jaccard=0.5,
        ).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    laps = timed_laps(run)
    print(json.dumps({"sf_dir": sf_dir, "n_media": n_media,
                      "laps": laps, "best": min(laps),
                      "wall": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
