"""SparkSession construction and per-session tuning.

Scale notes (100 TB target):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace the reference's hand-tuned
  per-file task sizing (reference: one Slurm task per input file,
  slurm_nodes.py:160-197).
- shuffle.partitions is a default for local testing; on a real cluster AQE
  picks the effective count from `advisoryPartitionSizeInBytes`.
- Session timezone pinned to UTC so timestamp semantics are deterministic
  and match the DuckDB oracle (naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_ORACLE_CONFS = {
    # Deterministic, oracle-comparable semantics.
    "spark.sql.session.timeZone": "UTC",
    # The driver-generated parquet stores TIMESTAMP(NANOS), which Spark's
    # vectorized reader rejects; read as long (ns) and convert in load_events.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Let Catalyst re-plan at runtime: coalesce small shuffles, split skew.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Start every shuffle wide and let AQE coalesce DOWN (parallelismFirst
    # keeps >= the core count): a fixed 32-partition shuffle was the
    # uniform cause of the sf1.0 outliers (SCALE.md — q_tpch_q3 2.73x,
    # q_minhash_lsh_pairs 2.57x: same plan spine, 10x rows per reducer).
    # On a real cluster this is the knob that scales reducer count with
    # data volume instead of with a static conf. 128 = 4x the local core
    # count: an A/B at sf1.0 showed 256 pays more in map-side bucket
    # overhead than it buys on this box, 64 under-splits the window-heavy
    # queries, 128 improves every former outlier.
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "128",
    # AQE inside cached plans: by default Spark compiles an
    # InMemoryRelation WITHOUT adaptive output partitioning (the
    # conservative upstream default protects consumers that assume the
    # cache's partitioning), so every shuffle under a .persist() runs at
    # the full initialPartitionNum uncoalesced — with the 128-wide AQE
    # start above, a cached subtree pays 128 uncoalesced reducers where
    # the uncached plan coalesces to a handful. materialize(eager=False)
    # persists, so this conf is load-bearing: the r9 ABBA measured
    # q_perplexity_buckets at 1.65x without it (SCALE.md round-9
    # adjudication).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # The driver's vanilla session defaults to 200 shuffle partitions —
    # wasteful at oracle scale (sf0.01) and for streaming state stores,
    # which size to this at checkpoint creation. Runtime-settable.
    "spark.sql.shuffle.partitions": "32",
}


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we did not build.

    The driver owns the session for ``queries()``; these confs are all
    runtime-mutable so we pin them per query for deterministic output.
    """
    for k, v in _ORACLE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this build; defaults are fine
    return spark


def get_spark(app_name: str = "metadata-enhanced-pretrain-datapipeline-spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build a local session shaped like one executor of a big cluster.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) else all cores.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0)
    master = f"local[{cpus}]" if cpus else "local[*]"
    shuffle = shuffle_partitions or max(cpus, 32)
    builder = SparkSession.builder.appName(app_name).master(master)
    # oracle confs first: the explicit sizing below must win over the
    # generic 32-partition default in _ORACLE_CONFS (last write wins)
    for k, v in _ORACLE_CONFS.items():
        builder = builder.config(k, v)
    builder = (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle))
        # keep the AQE starting width proportional to the session's
        # explicit sizing (4x, matching the 32->128 default ratio): the
        # fixed 128 in _ORACLE_CONFS is for sessions we did NOT build
        # (driver vanilla); here it would override a caller's small
        # shuffle_partitions (tests use 4) with 128 map-side buckets
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(4 * shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # reliable-checkpoint retention (checkpointing.py): without this,
        # every round of an iterative job leaves its checkpoint files on
        # the cluster FS forever; with it, Spark deletes them when the
        # checkpointed RDD is GC'd. Build-time-only conf.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
        # FileOutputCommitter v2: task commits move files to the final
        # directory directly instead of staging them for a SEQUENTIAL
        # driver-side merge at job commit. The engine's store layouts
        # are many-directory dynamic-partition writes (band stores,
        # IVF lists, LSH buckets: a 230-directory write measured 3.1s
        # under v1 vs 1.65s under v2, all of the delta driver-side),
        # and every store write already follows the write-then-swap
        # discipline documented in compact_*_store, so v2's weaker
        # job-abort atomicity (a failed job can leave partial files in
        # the target) is absorbed by the swap. Build-time-only conf.
        .config("spark.hadoop.mapreduce.fileoutputcommitter"
                ".algorithm.version", "2")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
