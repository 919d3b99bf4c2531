"""Similarity search over embedding columns (extension; prompt-mandated).

Baseline: brute-force cosine top-k — one narrow projection computing the
score plus a TakeOrdered (per-partition partial top-k, single merge): at
100 TB this is a full scan but NO shuffle of the vectors themselves.

Scale path: LSH bucketing by hyperplane signs — probe only the query's
bucket (and optionally neighboring buckets), turning the scan into a
partition-pruned lookup when bucketed/partitioned by `bucket` at write
time. An IVF variant would k-means the corpus; hyperplane LSH is chosen
because it is deterministic and expressible without an ML fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import cosine_similarity, positional_dot

#: deterministic pseudo-hyperplane weight for plane p at position i:
#: cycles through {-3..3}\{0}-ish small ints — public trick standing in for
#: seeded gaussian planes so results are engine-portable.


def _plane_weight(p: int):
    def w(i: Column) -> Column:
        return ((i * F.lit(7 + 2 * p) + F.lit(3 * p + 1)) % F.lit(7) - F.lit(3)).cast("double")

    return w


def lsh_bucket(vec: Column, num_planes: int = 8) -> Column:
    """Bucket id = Σ_p 2^p · [vec·plane_p > 0] — sign-of-projection LSH."""
    bucket = F.lit(0)
    for p in range(num_planes):
        proj = positional_dot(vec, _plane_weight(p))
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine to a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def lsh_topk(df: DataFrame, query_vec: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             num_planes: int = 8) -> DataFrame:
    """ANN top-k: restrict the exact search to the query's LSH bucket.

    With the corpus written bucketed/partitioned by `bucket`, the filter
    prunes partitions at scan time — the 100 TB query touches one bucket.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), num_planes))
    qrow = df.sparkSession.range(1).select(lsh_bucket(q, num_planes).alias("qb"))
    qb = qrow.collect()[0]["qb"]  # tiny driver-side scalar, like the reference's threshold
    return (
        bucketed.filter(F.col("bucket") == F.lit(qb))
        .select(F.col(id_col), F.round(cosine_similarity(F.col(vec_col), q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
