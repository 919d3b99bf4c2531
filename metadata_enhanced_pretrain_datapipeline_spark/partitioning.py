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
    """Repartition only if the input is narrower than the session's default
    parallelism (for CPU-heavy per-row stages: hashing, regex, model
    scoring).

    The width probe uses ``df.inputFiles()`` — metadata only. The previous
    ``df.rdd.getNumPartitions()`` probe is wrong under AQE twice over: the
    .rdd conversion finalizes the plan (eagerly executing upstream shuffle
    stages — a hidden job per call), and it reports the PRE-coalesce
    partition count, so it no-ops exactly when AQE later collapses a tiny
    shuffle to one partition. For scan-rooted plans, #files lower-bounds
    the scan width (big files split further); non-scan plans (empty
    inputFiles) repartition — one cheap round-robin shuffle ahead of a
    stage whose per-row CPU dominates it.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", str(target)))
    if n_files > 0:
        # scan-rooted: #files approximates width. Assumption: files are
        # adequately sized (the engine's writers cap file sizes, K1) —
        # many-tiny-files layouts pack into fewer partitions than files
        # and should be compacted upstream rather than patched here.
        width = n_files
        # Probe the ANALYZED plan, not optimizedPlan(): analysis is needed
        # by every action anyway and is cached on the QueryExecution,
        # whereas optimizedPlan() runs the full optimizer per call — O(plan)
        # duplicated driver work for every operator built on this helper
        # (Spark re-optimizes the final query regardless). Node names are
        # matched at LINE START of the tree rendering: a bare substring
        # test also hits column names and literals ('WindowStart',
        # 'Join us') and would silently cap a pure-scan input's width.
        import re as _re

        try:
            plan = df._jdf.queryExecution().analyzed().treeString()
        except Exception:
            plan = ""
        if _re.search(
            r"(?m)^[\s:+\-]*'?(Join|Aggregate|Deduplicate|Distinct|Window)\b", plan
        ):
            # the CPU-heavy stage runs POST-shuffle, where width is the
            # shuffle conf, not leaf scan width — a wide-files plan can
            # still narrow at the exchange. (AQE may coalesce below even
            # this; callers running heavy per-row work after an aggregation
            # should repartition explicitly.)
            width = min(width, shuffle_parts)
    else:
        # shuffle/in-memory-rooted: pre-AQE width is the shuffle conf.
        # Deliberately NOT df.rdd.getNumPartitions(): that finalizes the
        # AQE plan (a hidden job) and reads the post-coalesce count.
        width = shuffle_parts
    if width >= target:
        return df
    return df.repartition(target)
