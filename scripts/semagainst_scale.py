"""The deployed LEVER for against-store semantic dedup across decades
(SCALE.md r10): with a FIXED plane count both join sides grow with the
corpus over a fixed bucket space, so in-bucket pair work is quadratic
between decades (the registered twin's honest 9.3x at sf1.0->sf10).
Deployment scales the bucket space with the corpus instead — this probe
prices that: planes chosen so per-bucket populations MATCH across
scales (sf10/planes=12 -> ~16 stored/bucket; sf100/planes=15 -> ~20),
making the decade factor ~data-linear, not quadratic.

    python scripts/semagainst_scale.py .scale/sf10 12
    python scripts/semagainst_scale.py .scale/sf100 15
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    planes = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark("semagainst-scale")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = (e.filter(F.col("vec_id") % 3 == 1)
           .select("vec_id", "embedding")
           .unionByName(e.filter(F.col("vec_id") % 3 == 0).select(
               (F.col("vec_id") + 500000000).alias("vec_id"),
               "embedding")))
    seen = e.filter(F.col("vec_id") % 3 == 0).select("embedding")

    def run():
        dedup.embedding_dedup_against(
            new, seen, threshold=0.3, num_planes=planes,
            max_bucket_size=1024,
        ).write.format("noop").mode("overwrite").save()

    laps = timed_laps(run)
    print(json.dumps({"sf_dir": sf_dir, "planes": planes,
                      "buckets": 2 ** planes, "laps": laps,
                      "best": min(laps)}), flush=True)


if __name__ == "__main__":
    main()
