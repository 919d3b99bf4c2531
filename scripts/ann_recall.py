"""Recall@k audit of the ANN family vs exact brute force.

Speed without recall is half a claim: the SCALE.md A/Bs price the IVF /
int8 / composed-store probes, this script measures what they RETURN.
For a sample of query vectors it computes exact cosine top-k, then
recall@k of:

  - IVF float probe at nprobe = 1 / 2 / 4 (directory-pruning loss only)
  - int8 quantized full scan (quantization loss only)
  - the composed IVF-int8 store probe (both losses)
  - the two-stage re-rank (composed candidates -> exact re-rank), the
    production configuration whose overfetch is supposed to buy the
    recall back

    python scripts/ann_recall.py [sf_dir] [nlists] [n_queries]

Prints one JSON line per variant with mean recall@10.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf1.0"
    nlists = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    spark = get_spark("ann_recall")
    spark.sparkContext.setLogLevel("ERROR")
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.kmeans_fit(e, k=nlists, iters=4)

    store_path = "/tmp/ann_recall_store"
    similarity.write_ivf_quantized_store(e, store_path, cents)
    store = spark.read.parquet(store_path)

    qrows = (e.filter(F.col("vec_id") % 97 == 1).orderBy("vec_id")
             .limit(n_q).collect())
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]

    def ids(df):
        return [r[0] for r in df.collect()]

    variants: dict[str, list[float]] = {}
    for qid, qv in queries:
        corpus = e.filter(F.col("vec_id") != qid)
        cstore = store.filter(F.col("vec_id") != qid)
        exact = set(ids(similarity.brute_force_topk(corpus, qv, k=K)))

        def rec(name, got):
            variants.setdefault(name, []).append(
                len(exact & set(got)) / float(K))

        for np_ in (1, 2, 4, 8, 16):
            rec(f"ivf_float_nprobe{np_}",
                ids(similarity.ivf_topk(corpus, cents, qv, k=K, nprobe=np_)))
            rec(f"ivf_int8_nprobe{np_}",
                ids(similarity.ivf_quantized_topk(cstore, cents, qv, k=K,
                                                  nprobe=np_)))
        rec("int8_full_scan", ids(similarity.quantized_topk(corpus, qv, k=K)))
        rec("rerank_nprobe8",
            ids(similarity.ivf_quantized_rerank_topk(
                cstore, corpus, cents, qv, k=K, nprobe=8, overfetch=4)))

    for name in sorted(variants):
        vals = variants[name]
        print(json.dumps({
            "variant": name,
            "recall_at_10": round(sum(vals) / len(vals), 4),
            "n_queries": len(vals),
            "nlists": nlists,
            "sf_dir": sf_dir,
        }))


if __name__ == "__main__":
    main()
