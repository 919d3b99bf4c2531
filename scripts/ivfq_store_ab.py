"""A/B the composed production ANN store (VERDICT r7 directive 2):
IVF-partitioned layout of int8 codes (write_ivf_quantized_store →
ivf_quantized_topk) vs float brute force over the same corpus, plus the
intermediate single-lever layouts for attribution:

  float_brute — brute_force_topk over the float32 column (baseline)
  ivf_float   — IVF-partitioned FLOAT store probed at nprobe
                (directory-pruning lever alone)
  ivf_int8    — the composed store: nprobe directories of tinyint codes
                (both levers; qscale column-pruned out of the scan)

and the byte sizes of each layout. Expected shape: ivf_int8 reads
(nprobe/nlists) of the directories AND ~3.7x fewer bytes per directory,
so its scan fraction is the product of the two levers.

Usage:  SPARK_DRIVER_MEMORY=48g python scripts/ivfq_store_ab.py .scale/sf10 [nlists] [nprobe]
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity
from metadata_enhanced_pretrain_datapipeline_spark.queries import load
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def _du(path: str) -> int:
    return sum(p.stat().st_size for p in pathlib.Path(path).rglob("*")
               if p.is_file())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    nlists = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    nprobe = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("ivfq-store-ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    corpus = e.filter(F.col("vec_id") != 0)
    # static codebook: first nlists vectors (hash-free, deterministic —
    # the q_ivf_static_topk convention, just wider)
    cents = [[float(x) for x in r.embedding] for r in
             e.filter(F.col("vec_id") < nlists).orderBy("vec_id").collect()]
    out: dict = {"sf_dir": sf_dir, "nlists": nlists, "nprobe": nprobe,
                 "n_vectors": corpus.count()}

    laps = timed_laps(lambda: similarity.brute_force_topk(corpus, qvec, 10)
                      .write.format("noop").mode("overwrite").save())
    out["float_brute"] = {"laps": laps, "best": min(laps)}

    tmp = tempfile.mkdtemp(prefix="ivfq_")
    try:
        fstore = f"{tmp}/ivf_float.parquet"
        qstore = f"{tmp}/ivf_int8.parquet"
        (similarity.ivf_assign(corpus, cents)
         .select("vec_id", "embedding", "list_id")
         .write.mode("overwrite").partitionBy("list_id").parquet(fstore))
        similarity.write_ivf_quantized_store(corpus, qstore, cents)
        out["bytes"] = {"ivf_float": _du(fstore), "ivf_int8": _du(qstore),
                        "ratio": round(_du(fstore) / _du(qstore), 2)}

        fback = spark.read.parquet(fstore)
        laps = timed_laps(lambda: similarity.ivf_topk(
            fback, cents, qvec, 10, nprobe=nprobe, list_col="list_id")
            .write.format("noop").mode("overwrite").save())
        out["ivf_float_probe"] = {"laps": laps, "best": min(laps)}

        qback = spark.read.parquet(qstore)
        laps = timed_laps(lambda: similarity.ivf_quantized_topk(
            qback, cents, qvec, 10, nprobe=nprobe)
            .write.format("noop").mode("overwrite").save())
        out["ivf_int8_probe"] = {"laps": laps, "best": min(laps)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
