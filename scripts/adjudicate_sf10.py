"""Adjudicate the two unexplained sf10 ratios (VERDICT r6 #2).

1. q_window_suite 7.7x: hypothesis — the suite partitions by
   event_type, which has FIVE distinct values at every scale (the
   replica replicates rows, not key cardinality), so the window sort
   runs in 5 tasks on a 32-core box: per-task width grows 10x while
   parallelism stays 5. Evidence: the SAME five window functions over
   the high-cardinality user_id key at the same scale — if the wall
   collapses, the cause is partition width, not the window operators.

2. q_embedding_topk 6.2x: hypothesis — brute force scores every vector
   by design (linear work; sf1.0 is overhead-dominated on idle cores,
   sf10 is saturated real work). The SCALE PATH is the pruned IVF
   layout. Evidence: on a PREBUILT list-partitioned index at sf10, the
   ivf probe (nprobe=2 of 4 lists, PartitionFilters pruning) must beat
   the brute-force scan — that comparison is the reason IVF exists.

Usage:  SPARK_DRIVER_MEMORY=48g python scripts/adjudicate_sf10.py .scale/sf10
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import similarity
from metadata_enhanced_pretrain_datapipeline_spark.queries import (
    _scratch_dir, _static_codebook, load, load_events)
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    spark = get_spark("adjudicate-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir}

    # --- 1. window suite: event_type (5 partitions) vs user_id ---
    e = load_events(spark, sf_dir)

    def suite(part_col):
        w = Window.partitionBy(part_col).orderBy("ts", "event_id")
        wf = w.rowsBetween(-2, Window.currentRow)
        df = e.select(
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.lead("event_id").over(w).alias("next_event"),
            F.sum("value").over(wf).alias("moving_sum"),
        )
        return lambda: df.write.format("noop").mode("overwrite").save()

    out["window_event_type"] = timed_laps(suite("event_type"))
    out["window_user_id"] = timed_laps(suite("user_id"))
    out["n_event_types"] = e.select("event_type").distinct().count()
    out["n_users"] = e.select("user_id").distinct().count()
    out["n_events"] = e.count()

    # --- 2. brute-force topk vs pruned-IVF probe on a prebuilt index ---
    emb = load(spark, sf_dir, "embeddings")
    cents = _static_codebook(emb)
    path = _scratch_dir(sf_dir, "adjudicate_ivf")
    similarity.ivf_assign(emb, cents).write.mode("overwrite") \
        .partitionBy("list_id").parquet(path)          # index build: once
    back = spark.read.parquet(path)

    def brute():
        qvec = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"))
        from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import cosine_similarity
        df = (emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(qvec))
              .select("vec_id",
                      F.round(cosine_similarity(F.col("embedding"),
                                                F.col("qv")), 6)
                      .alias("cosine"))
              .orderBy(F.desc("cosine"), F.col("vec_id")).limit(10))
        return lambda: df.write.format("noop").mode("overwrite").save()

    def probe():
        df = similarity.ivf_topk(back, cents, cents[0], k=10, nprobe=2,
                                 list_col="list_id")
        return lambda: df.write.format("noop").mode("overwrite").save()

    out["brute_topk"] = timed_laps(brute())
    out["ivf_probe_prebuilt"] = timed_laps(probe())
    out["n_vectors"] = emb.count()
    rows_probed = back.filter(F.col("list_id").isin([0, 1, 2, 3])) \
        .groupBy("list_id").count().collect()
    out["list_sizes"] = {int(r["list_id"]): int(r["count"])
                         for r in rows_probed}

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
