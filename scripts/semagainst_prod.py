"""Production-shaped config check for embedding_dedup_against.

The registered q_semantic_dedup_against fixture (planes=6, uncapped —
pigeonhole-complete for the oracle) is quadratic by construction: the
64-bucket space is constant while the corpus grows, so bucket
populations ∝ corpus and the new-vs-store join ∝ corpus². This run
prices the deployed shape instead: finer buckets (planes=12 → 4096)
plus the default degenerate-bucket cap, at one scale.

    python scripts/semagainst_prod.py .scale/sf10
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
    spark = get_spark("semagainst-prod")
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
            new, seen, threshold=0.3, num_planes=12, max_bucket_size=1024,
        ).write.format("noop").mode("overwrite").save()

    laps = timed_laps(run)
    print(json.dumps({"config": "planes=12 cap=1024 (production-shaped)",
                      "sf_dir": sf_dir, "laps": laps,
                      "best": min(laps)}), flush=True)


if __name__ == "__main__":
    main()
