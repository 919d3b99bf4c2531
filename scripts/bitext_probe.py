"""Fixed-|X| scaling probe for margin-based bitext mining.

The registered q_bitext_mine fixture derives BOTH sides from the
corpus, so its decade ratio prices |X|·|Y|/nlists = 100×/decade work —
quadratic by construction (the hard-negative/semantic-decontam
adjudication shape, SCALE.md). The pipeline question a real mining run
asks is different: with the source-language side FIXED (a bounded
mining batch, the flat-miner |Q| lesson) and the target corpus growing
10×, does the list_id equi-join scale ~linearly per decade?

X = the 95 lowest-vec_id vectors of the SMALLEST scale's corpus id
space (mod-211 sample, present verbatim in every replica — the
supersets property), Y = the whole corpus at the probed scale.
Codebook = the shared first-4 static codebook. Run back-to-back in
fresh JVMs, one per scale:

    python scripts/bitext_probe.py .scale/sf1.0
    python scripts/bitext_probe.py .scale/sf10
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    spark = get_spark("bitext-probe")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    # fixed mining batch: 95 ids from the sf0.1 id range (mod-211 like
    # the hardneg probe), present identically at every scale
    x = (e.filter((F.col("vec_id") % 211 == 3) & (F.col("vec_id") < 5000))
         .select(F.col("vec_id").alias("vec_id"), "embedding"))
    nx = x.count()

    def run():
        similarity.mine_bitext(
            x, e.select("vec_id", "embedding"), cents, k=4,
            margin_threshold=1.0, mutual=True,
        ).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    laps = timed_laps(run)
    print(json.dumps({
        "sf_dir": sf_dir, "n_x": nx,
        "corpus": e.count(), "laps": laps, "best": min(laps),
        "wall": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
