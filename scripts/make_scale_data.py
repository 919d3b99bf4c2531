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


def main() -> None:
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
