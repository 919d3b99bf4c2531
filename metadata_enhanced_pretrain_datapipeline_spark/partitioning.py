"""Partitioning helpers.

At 100 TB inputs arrive as thousands of parquet files and Spark's scan
splitting (`spark.sql.files.maxPartitionBytes`) yields ample parallelism.
At test scale a table is often ONE small file → one partition → a CPU-bound
narrow stage runs on one core of 32. `ensure_min_partitions` widens only in
that degenerate case, so production plans (already wide) are untouched —
repartitioning an already-parallel input would add a pointless shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition only if the input has fewer partitions than the session's
    default parallelism (for CPU-heavy per-row stages: hashing, regex,
    model scoring)."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
