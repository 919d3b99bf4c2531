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

An ``ivfK`` token (e.g. ``ivf64``) runs the LARGE-CORPUS bucketing
branch instead: nearest-centroid assignment against a static first-K
codebook (semantic_dedup(centroids=...), the SemDeDup paper's k-means
clustering shape) — the lever that keeps scaling past the 2**15-bucket
plane cap. K stays modest here because _nearest_centroid_col is a
K-way argmax expression per row; production K in the thousands wants
the codebook windowed or the assignment done via the IVF store layout.
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
    modes = sys.argv[2:] or ["6", "12"]
    spark = get_spark("semantic-planes-ab")
    spark.sparkContext.setLogLevel("ERROR")
    e = load(spark, sf_dir, "embeddings")
    out: dict = {"sf_dir": sf_dir, "n_vectors": e.count()}
    from pyspark.sql import functions as F

    for m in modes:
        if m.startswith("ivf"):
            k = int(m[3:])
            cents = [[float(x) for x in r.embedding] for r in
                     e.filter(F.col("vec_id") < k).orderBy("vec_id").collect()]
            kwargs = {"centroids": cents}
        else:
            kwargs = {"num_planes": int(m)}
        kept_rows = {}

        def run(kwargs=kwargs, kept_rows=kept_rows):
            kept = dedup.semantic_dedup(
                e, id_col="vec_id", vec_col="embedding", threshold=0.3,
                max_bucket_size=None, **kwargs)
            kept_rows["n"] = kept.count()

        laps = timed_laps(run)
        key = m if m.startswith("ivf") else f"planes_{m}"
        out[key] = {"laps": laps, "best": min(laps), "kept": kept_rows["n"]}
        print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
