"""Bucketed-miner-only scale lap (fixed |Q|): the sf100 companion to
scripts/hardneg_ab.py. The flat miner's corpus-wide fan-out is the
ad-hoc tool and at sf100/default-heap it is spill-bound by design (its
per-(query, partition) groups carry whole-partition candidate lists —
see _rank_bands' memory note); the BUCKETED miner is the pipeline
operator, so the third-decade probe prices it alone:

    python scripts/hardneg_bucketed_probe.py .scale/sf100 [fit_sample]

``fit_sample`` (default 0.01 at sf100 scale) fits the codebook on a
sample per the kmeans_fit sample-fit contract; assignment still covers
the full corpus.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf100"
    fit_sample = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    spark = get_spark("hardneg_bucketed_probe")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = spark.read.parquet(".scale/sf1.0/embeddings.parquet")
    qids = sorted(r.vec_id for r in
                  base.filter(F.col("vec_id") % 211 == 3).collect())
    have = e.filter(F.col("vec_id").isin(qids)).count()
    assert have == len(qids), f"{len(qids) - have} query ids missing"
    # sample-fit (similarity.kmeans_fit docstring): the codebook trains
    # on ~fit_sample of the corpus; ivf_assign covers every row
    cents = similarity.kmeans_fit(
        e.sample(fraction=fit_sample, seed=7), k=NLISTS, iters=3)
    laps = timed_laps(lambda: similarity.mine_hard_negatives_bucketed(
        e, qids, cents).write.format("noop").mode("overwrite").save())
    print(json.dumps({"sf_dir": sf_dir, "n_queries": len(qids),
                      "nlists": NLISTS, "fit_sample": fit_sample,
                      "bucketed_laps": laps, "bucketed": min(laps)}))


if __name__ == "__main__":
    main()
