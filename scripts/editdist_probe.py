"""Operator-true probe for edit_distance_pairs: the registered fixture
prices the md5-PORTABLE minhash path (oracle parity); the production
default is portable=False (JVM xxhash64 shingles — the same fast/oracle
split as q_minhash_lsh_pairs vs q_minhash_pairs_portable). This probes
the deployed config on the same augmented corpus the fixture builds.

    SPARK_DRIVER_MEMORY=48g python scripts/editdist_probe.py .scale/sf1.0
    SPARK_DRIVER_MEMORY=48g python scripts/editdist_probe.py .scale/sf10
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    portable = "--portable" in sys.argv
    spark = get_spark("editdist-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    twins = d.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zz zz")).alias("text"))
    aug = d.unionAll(twins).repartition(32)

    def run():
        dedup.edit_distance_pairs(
            aug, max_edits=8, num_hashes=8, bands=4,
            max_bucket_size=64, portable=portable,
        ).write.format("noop").mode("overwrite").save()

    import time
    t0 = time.time()
    laps = timed_laps(run)
    print(json.dumps({"sf_dir": sf_dir, "portable": portable,
                      "laps": laps, "best": min(laps),
                      "wall": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
