"""Fixed-|bench| A/B for semantic decontamination.

The registered q_semantic_decontam fixture's benchmark (vec_id%97==3)
GROWS with the corpus, so its decade ratio measures |corpus| x |bench|
= 100x work per decade — quadratic by construction, the same shape the
r8 hard-negative adjudication named (SCALE.md). A real benchmark does
not grow when the crawl does, so the pipeline-operator question is:
with the benchmark FIXED (ids below sf1.0's ceiling, present verbatim
in every larger replica — the supersets property), does the flat
broadcast scan scale ~linearly per decade, and what does the IVF
equi-join path save on top?

Run back-to-back in fresh JVMs, one per scale (the ABBA protocol):

    python scripts/semdecon_ab.py .scale/sf1.0
    python scripts/semdecon_ab.py .scale/sf10
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

#: below sf1.0's max vec_id — the same benchmark rows at every scale
BOUND = 10_000_000


def _bench(e):
    # the registered fixture's sign-flip perturbation, bounded
    return e.filter((F.col("vec_id") % 97 == 3)
                    & (F.col("vec_id") < BOUND)).select(
        F.col("vec_id").alias("bench_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i.cast("bigint") == F.col("vec_id") % 64,
                                -x.cast("double"))
            .otherwise(x.cast("double"))).alias("embedding"))


def main() -> None:
    if len(sys.argv) != 2:
        sys.exit("usage: semdecon_ab.py <sf_dir>")
    sf_dir = sys.argv[1]
    spark = get_spark("semdecon-ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = _bench(e)
    n_bench = bench.count()
    cents = [[float(x) for x in r["embedding"]]
             for r in e.filter(F.col("vec_id") < 4)
             .orderBy("vec_id").collect()]
    res = {"sf_dir": sf_dir, "n_bench": n_bench, "n_corpus": e.count()}

    def flat():
        dedup.semantic_decontaminate(e, bench, threshold=0.7) \
            .write.format("noop").mode("overwrite").save()

    def ivf():
        dedup.semantic_decontaminate(e, bench, threshold=0.7,
                                     centroids=cents, nprobe=2) \
            .write.format("noop").mode("overwrite").save()

    res["flat_sec"] = min(timed_laps(flat))
    res["ivf_sec"] = min(timed_laps(ivf))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
