"""Semantic decontamination (embedding-cosine vs benchmark vectors):
the paraphrase-leakage complement of the n-gram contamination family."""

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup


def _corpus(spark):
    rows = [
        (1, [1.0, 0.9]),    # near the benchmark leak, list A
        (2, [1.0, 0.0]),    # clean, list A
        (3, [0.0, 1.0]),    # clean, list B
        (4, [-1.0, 0.2]),   # clean, anti-aligned
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_flat_decontaminate_drops_only_hits(spark):
    corpus = _corpus(spark)
    bench = spark.createDataFrame(
        [(100, [2.0, 1.8])],  # scaled copy of vec 1 -> cosine 1.0
        "bench_id bigint, embedding array<double>")
    kept = sorted(r.vec_id for r in dedup.semantic_decontaminate(
        corpus, bench, threshold=0.9).collect())
    assert kept == [2, 3, 4]
    hits = dedup.semantic_contamination_hits(
        corpus, bench, threshold=0.9).collect()
    assert [(r.corpus_id, r.bench_id, r.cosine) for r in hits] == [(1, 100, 1.0)]


def test_bucketed_nprobe_catches_boundary_leak(spark):
    """The reason nprobe exists: bench [0.9, 1.0] argmax-assigns to list
    B while its contaminated partner vec 1 lives in list A — nprobe=1
    misses the hit, nprobe=2 probes the neighbor list and catches it."""
    corpus = _corpus(spark)
    cents = [[1.0, 0.0], [0.0, 1.0]]
    bench = spark.createDataFrame(
        [(200, [0.9, 1.0])], "bench_id bigint, embedding array<double>")
    miss = dedup.semantic_contamination_hits(
        corpus, bench, threshold=0.9, centroids=cents, nprobe=1).collect()
    assert miss == []
    hit = dedup.semantic_contamination_hits(
        corpus, bench, threshold=0.9, centroids=cents, nprobe=2).collect()
    assert [(r.corpus_id, r.bench_id) for r in hit] == [(1, 200)]
    # and the equi-join path dedups end to end
    kept = sorted(r.vec_id for r in dedup.semantic_decontaminate(
        corpus, bench, threshold=0.9, centroids=cents, nprobe=2).collect())
    assert kept == [2, 3, 4]


def test_benchmark_bound_raises_loudly(spark):
    corpus = _corpus(spark)
    bench = spark.range(5).select(
        F.col("id").alias("bench_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    with pytest.raises(ValueError, match="max_benchmark"):
        dedup.semantic_contamination_hits(corpus, bench, max_benchmark=4)
