"""Build a larger scale-factor replica of the driver testdata for the
scale-stress run (SCALE.md): every fact table is replicated ``factor``
times with per-copy key offsets so each copy is a self-consistent
sub-universe (joins land within a copy; region/nation stay shared, as
TPC-H leaves dimension cardinality fixed).

Content columns are DECORRELATED across copies so data-dependent
operator load scales linearly instead of quadratically:

- ``documents.text``: every whitespace token gets a per-copy suffix, so
  cross-copy shingle Jaccard is ~0 — MinHash/SimHash/exact-dedup see 10x
  the docs with the SAME per-copy duplicate structure, not 10x-dense
  near-dup cliques (which would benchmark an artifact, not the design).
- ``embeddings.embedding``: rotated by the copy index — norm-preserving
  but direction-decorrelating, so LSH/ANN bucket loads scale linearly.

Timestamp-ns columns (events.ts, o_orderdate, l_shipdate) pass through
as the bigint nanos our session reads them as (nanosAsLong), keeping the
replica byte-compatible with the loaders in queries.py.

Usage:
    python scripts/make_scale_data.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 .scale/sf1.0

Clustered-embedding mode (VERDICT r8 #2 — the recall fixture where
IVF bucketing is supposed to WIN, complementing the near-orthogonal
random-vector corpus that is its adversarial worst case):

    python scripts/make_scale_data.py clustered [dst_dir] [n_vecs] \
        [n_clusters] [dim] [sigma]
Defaults: .scale/clustered 20000 16 64 0.08

Writes ``embeddings.parquet`` (vec_id, embedding) as a deterministic
mixture of Gaussians: unit-norm cluster centers from
``default_rng(42)``, vector i = normalize(center[i % n_clusters] +
sigma * default_rng(i).standard_normal(dim)) — generated
distributively (mapInPandas over a range frame; every value is a pure
function of vec_id, so any partitioning/rerun reproduces it
bit-identically). With sigma^2 * dim << 1 a vector's true top-k
neighbors are overwhelmingly same-cluster, so a k-means codebook
concentrates them in few lists and small nprobe/nlists should recover
recall@10 >= ~0.9 — the published counterpart to the adversarial
fixture's nprobe/nlists-bounded recall (SCALE.md).
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, ".")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

#: per-table (key column -> per-copy offset stride). Strides exceed each
#: key's sf0.1 range by >6x so copies can never collide.
KEY_STRIDES = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 10_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000,
                 "l_suppkey": 10_000},
    "events": {"event_id": 1_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
SHARED_DIMS = ["region", "nation"]


def _copy(df: DataFrame, table: str, k: int) -> DataFrame:
    out = df
    for col, stride in KEY_STRIDES.get(table, {}).items():
        out = out.withColumn(col, F.col(col) + F.lit(k * stride))
    if k and table == "documents":
        out = out.withColumn(
            "text", F.regexp_replace("text", r"(\S+)", f"$1~{k}")
        )
    if k and table == "embeddings":
        n = F.size("embedding")
        r = F.lit(k) % n
        out = out.withColumn(
            "embedding",
            F.when(r == 0, F.col("embedding")).otherwise(
                F.concat(
                    F.expr(f"slice(embedding, {k} % size(embedding) + 1, "
                           f"size(embedding) - {k} % size(embedding))"),
                    F.expr(f"slice(embedding, 1, {k} % size(embedding))"),
                )
            ),
        )
    return out


def make_clustered(argv: list[str]) -> None:
    dst = argv[0] if argv else ".scale/clustered"
    n_vecs = int(argv[1]) if len(argv) > 1 else 20_000
    n_clusters = int(argv[2]) if len(argv) > 2 else 16
    dim = int(argv[3]) if len(argv) > 3 else 64
    sigma = float(argv[4]) if len(argv) > 4 else 0.08

    import numpy as np

    spark = get_spark("make-clustered-embeddings")
    spark.sparkContext.setLogLevel("ERROR")
    centers = np.random.default_rng(42).standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            vecs = []
            for vid in pdf["vec_id"].to_numpy():
                g = np.random.default_rng(int(vid)).standard_normal(dim)
                v = centers[int(vid) % n_clusters] + sigma * g
                vecs.append([float(x) for x in v / np.linalg.norm(v)])
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "embedding": vecs})

    (spark.range(n_vecs).withColumnRenamed("id", "vec_id")
     .repartition(32)
     .mapInPandas(gen, "vec_id long, embedding array<double>")
     .write.mode("overwrite").parquet(f"{dst}/embeddings.parquet"))
    print(f"clustered embeddings: "
          f"{spark.read.parquet(f'{dst}/embeddings.parquet').count()} rows "
          f"({n_clusters} clusters, dim {dim}, sigma {sigma}) -> {dst}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "clustered":
        make_clustered(sys.argv[2:])
        return
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else ".scale/sf1.0"
    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    for table in SHARED_DIMS + list(KEY_STRIDES):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table not in SHARED_DIMS:
            df = functools.reduce(
                DataFrame.unionByName,
                [_copy(df, table, k) for k in range(factor)],
            )
        df.write.mode("overwrite").parquet(f"{dst}/{table}.parquet")
        print(f"{table}: {spark.read.parquet(f'{dst}/{table}.parquet').count()} rows")


if __name__ == "__main__":
    main()
