"""Itemize the stream-drain queries' phase costs (r13, VERDICT item 1).

Replays q_stream_crawl_ingest's body with phase timers and captures each
micro-batch's StreamingQueryProgress durationMs breakdown (triggerExecution,
addBatch, queryPlanning, walCommit, commitOffsets, latestOffset/getBatch) —
the per-phase cost table the round deliverable asks for. Run:

    python scripts/stream_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from metadata_enhanced_pretrain_datapipeline_spark import queries as q  # noqa: E402
from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup  # noqa: E402
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark  # noqa: E402
from metadata_enhanced_pretrain_datapipeline_spark.sources import readers  # noqa: E402
from metadata_enhanced_pretrain_datapipeline_spark.checkpointing import materialize  # noqa: E402


def crawl_ingest_phases(spark, sf):
    t = {}
    t0 = time.time()
    scratch = q._build_crawl_fixture(spark, sf, "stream_crawl")
    t["fixture_build"] = round(time.time() - t0, 3)

    out = q._scratch_dir(sf, "stream_crawl_out")
    store, ck = f"{out}/store", f"{out}/ck"
    for p in (store, ck):
        shutil.rmtree(p, ignore_errors=True)

    t0 = time.time()
    stream = (
        spark.readStream.format("binaryFile")
        .schema(readers.BINARY_FILE_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .load(scratch))
    curated = q._crawl_curate(readers.parse_warc_records(stream))
    sq = (curated.writeStream.format("parquet")
          .option("path", store)
          .option("checkpointLocation", ck)
          .trigger(availableNow=True)
          .start())
    sq.awaitTermination()
    t["stream_drain"] = round(time.time() - t0, 3)
    prog = [json.loads(p.json) for p in sq.recentProgress]
    t["micro_batches"] = [
        {"batchId": p.get("batchId"),
         "numInputRows": p.get("numInputRows"),
         "durationMs": p.get("durationMs")} for p in prog]

    t0 = time.time()
    corpus = materialize(
        dedup.dedup_exact_text(spark.read.parquet(store).repartition(32)),
        eager=False)
    dedup.minhash_dedup(
        corpus, num_hashes=8, bands=4, shingle_n=3,
        max_bucket_size=64, portable=True).select("doc_id", "text") \
        .write.format("noop").mode("overwrite").save()
    t["batch_dedup"] = round(time.time() - t0, 3)
    return t


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    # warm lap (JIT + IO cache), then the profiled lap — bench protocol
    for lap in ("warm", "profiled"):
        t = crawl_ingest_phases(spark, sf)
        print(json.dumps({"lap": lap, "q_stream_crawl_ingest": t},
                         indent=1))


if __name__ == "__main__":
    main()
