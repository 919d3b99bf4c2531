"""A/B the hard-negative miners at scale with a FIXED query set.

The registered q_hard_negative_mine fixture samples queries by modulo,
so |Q| grows with the corpus and its sf1.0->sf10 wall ratio conflates
two axes (10x corpus x 10x queries = 100x work — the measured 31x is
SUBLINEAR in work). This script pins |Q| to the sf1.0 sample at both
scales and prices the flat corpus-fan-out miner against the
IVF-bucketed one (nlists=16), one fresh JVM per (scale, variant) lap
via the canonical timed_laps protocol:

    SPARK_DRIVER_MEMORY=48g python scripts/hardneg_ab.py .scale/sf1.0 [fit_sample]
    SPARK_DRIVER_MEMORY=48g python scripts/hardneg_ab.py .scale/sf10  [fit_sample]

``fit_sample`` < 1.0 fits the codebook on a corpus sample (the
kmeans_fit sample-fit contract — at sf100 the full-corpus fit this
script originally did is itself a multi-decade job and the r9 probe
died inside it at default heap; scripts/hardneg_bucketed_probe.py is
the third-decade harness). Default 1.0 preserves comparability with
the r8-recorded numbers.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

NLISTS = 16


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    fit_sample = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    spark = get_spark("hardneg_ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # FIXED query set: the sf1.0 modulo sample, reused verbatim at every
    # scale (the replicas' id spaces are sparse supersets)
    base = spark.read.parquet(".scale/sf1.0/embeddings.parquet")
    qids = sorted(r.vec_id for r in
                  base.filter(F.col("vec_id") % 211 == 3).collect())
    have = e.filter(F.col("vec_id").isin(qids)).count()
    assert have == len(qids), f"{len(qids) - have} query ids missing"
    fit_input = (e.sample(fraction=fit_sample, seed=7)
                 if fit_sample < 1.0 else e)
    cents = similarity.kmeans_fit(fit_input, k=NLISTS, iters=3)

    results = {}
    laps = timed_laps(lambda: similarity.mine_hard_negatives(
        e, qids).write.format("noop").mode("overwrite").save())
    results["flat"] = min(laps)
    laps = timed_laps(lambda: similarity.mine_hard_negatives_bucketed(
        e, qids, cents).write.format("noop").mode("overwrite").save())
    results["bucketed"] = min(laps)
    print(json.dumps({"sf_dir": sf_dir, "n_queries": len(qids),
                      "nlists": NLISTS, **results}))


if __name__ == "__main__":
    main()
