"""Adjudicate q_quantized_topk's scaling and place the int8 win where it
actually lives. Three probes over the same corpus + the stored layout:

  float    — brute_force_topk over the float32 column (the baseline)
  inflight — quantized_topk re-quantizing per query (the REGISTERED
             query's shape: correct, oracle-checkable, but pays
             abs/max/divide/floor array passes per row per query)
  stored   — quantize ONCE at write time (quantize_embeddings →
             parquet), probe the tinyint codes (prequantized=True) —
             the production shape

plus the byte sizes of the float vs int8 parquet layouts: the int8 win
is BYTES (storage/shuffle/scan), not FLOPs — on a page-cached local
disk the stored probe is roughly compute-par with float, while the
layout is ~4x smaller, which is what a 100 TB scan actually pays for.

Usage:  SPARK_DRIVER_MEMORY=48g python scripts/quantized_store_ab.py .scale/sf10
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
    spark = get_spark("quantized-store-ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in
            e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    corpus = e.filter(F.col("vec_id") != 0)
    out: dict = {"sf_dir": sf_dir, "n_vectors": corpus.count()}

    laps = timed_laps(lambda: similarity.brute_force_topk(corpus, qvec, 10)
                      .write.format("noop").mode("overwrite").save())
    out["float_brute"] = {"laps": laps, "best": min(laps)}

    laps = timed_laps(lambda: similarity.quantized_topk(corpus, qvec, 10)
                      .write.format("noop").mode("overwrite").save())
    out["inflight_quantized"] = {"laps": laps, "best": min(laps)}

    tmp = tempfile.mkdtemp(prefix="qstore_")
    try:
        store = f"{tmp}/codes.parquet"
        floatstore = f"{tmp}/float.parquet"
        (similarity.quantize_embeddings(corpus)
         .select("vec_id", "qvec", "qscale")
         .write.mode("overwrite").parquet(store))
        corpus.select("vec_id", "embedding").write.mode(
            "overwrite").parquet(floatstore)
        out["bytes"] = {"float32": _du(floatstore), "int8": _du(store),
                        "ratio": round(_du(floatstore) / _du(store), 2)}
        codes = spark.read.parquet(store)
        laps = timed_laps(lambda: similarity.quantized_topk(
            codes, qvec, 10, vec_col="qvec", prequantized=True)
            .write.format("noop").mode("overwrite").save())
        out["stored_quantized"] = {"laps": laps, "best": min(laps)}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
