"""Measure the monthly-snapshot economics claim (docs/incremental_dedup.md):
fuzzy-deduping a new snapshot against a PERSISTED band store must cost
~O(new), while the naive path (re-shingle the old corpus too) costs
~O(old + new). Old:new is split 9:1 by doc_id so the ratio mirrors a
monthly increment on a mature corpus.

    python scripts/store_economics.py [sf_dir]

Prints one JSON line: store write (amortized, paid once at old-snapshot
close), incremental probe, naive re-shingle — warm best-of-2 each.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark

NUM_HASHES, BANDS = 32, 8


def timed(fn) -> float:
    from bench import timed_laps  # the ONE lap protocol (bench.py)

    return min(timed_laps(fn))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("store-econ")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    old = d.filter(F.col("doc_id") % 10 != 0)   # mature corpus: 90%
    new = d.filter(F.col("doc_id") % 10 == 0)   # monthly increment: 10%
    store_path = f"/tmp/mep_store_econ_{os.getpid()}"

    def write_store() -> None:
        dedup.write_band_store(
            dedup.minhash_band_keys(
                dedup.minhash_signatures(old.select("doc_id", "text"),
                                         num_hashes=NUM_HASHES),
                num_hashes=NUM_HASHES, bands=BANDS),
            store_path)

    def incremental() -> None:
        store = dedup.read_band_store(spark, store_path)
        dedup.minhash_dedup_against(new, store, num_hashes=NUM_HASHES,
                                    bands=BANDS).count()

    def naive() -> None:
        # no store: band keys of the OLD corpus recomputed from text
        seen = dedup.minhash_band_keys(
            dedup.minhash_signatures(old.select("doc_id", "text"),
                                     num_hashes=NUM_HASHES),
            num_hashes=NUM_HASHES, bands=BANDS)
        dedup.minhash_dedup_against(new, seen, num_hashes=NUM_HASHES,
                                    bands=BANDS).count()

    result = {
        "sf_dir": sf_dir,
        "n_old": old.count(),
        "n_new": new.count(),
        "store_write_once_sec": timed(write_store),
        "incremental_probe_sec": timed(incremental),
        "naive_reshingle_sec": timed(naive),
    }
    result["naive_over_incremental"] = round(
        result["naive_reshingle_sec"] / result["incremental_probe_sec"], 2)
    print(json.dumps(result))

    import shutil
    shutil.rmtree(store_path, ignore_errors=True)


if __name__ == "__main__":
    main()
