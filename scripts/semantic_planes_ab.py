"""Adjudicate q_semantic_dedup's scaling: the registered query pins
num_planes=6 (64 buckets) with no bucket cap so the sf0.01 ORACLE sees a
non-trivial pair set — but at fixed bucket count the in-bucket exact
verify is quadratic in bucket width, so the fixture config scales
superlinearly by construction. The production lever the operator
docstring prescribes is num_planes (finer buckets), not the cap (which
trades recall). This A/B measures the lever: the same corpus, same
threshold, planes 6 vs 12 — bucket width drops 64x, the verify
returns to ~linear.

Usage:  SPARK_DRIVER_MEMORY=48g python scripts/semantic_planes_ab.py .scale/sf1.0 6 12
        SPARK_DRIVER_MEMORY=48g python scripts/semantic_planes_ab.py .scale/sf10 12
(planes=6 at sf10 is ~100x the sf1.0 pair count — omitted by design;
the sf1.0 pair extrapolates it.)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from bench import timed_laps
from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup
from metadata_enhanced_pretrain_datapipeline_spark.queries import load
from metadata_enhanced_pretrain_datapipeline_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    planes = [int(p) for p in sys.argv[2:]] or [6, 12]
    spark = get_spark("semantic-planes-ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "embeddings")
    out: dict = {"sf_dir": sf_dir, "n_vectors": e.count()}
    for p in planes:
        kept_rows = {}

        def run(p=p, kept_rows=kept_rows):
            kept = dedup.semantic_dedup(
                e, id_col="vec_id", vec_col="embedding", threshold=0.3,
                num_planes=p, max_bucket_size=None)
            kept_rows["n"] = kept.count()

        laps = timed_laps(run)
        out[f"planes_{p}"] = {"laps": laps, "best": min(laps),
                              "kept": kept_rows["n"]}
        print(json.dumps({f"planes_{p}": out[f"planes_{p}"]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
