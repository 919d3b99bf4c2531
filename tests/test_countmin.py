"""Count-Min sketch: one-sided error, mergeability, exact-hash parity."""

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators.aggregates import (
    countmin_estimate,
    countmin_sketch,
)


@pytest.fixture(scope="module")
def stream(spark):
    # skewed frequencies: token t{i} appears (i+1)*3 times
    rows = [(f"t{i}",) for i in range(30) for _ in range((i + 1) * 3)]
    return spark.createDataFrame(rows, "k string")


def test_sketch_shape_and_mass(spark, stream):
    sk = countmin_sketch(stream, "k", width=16, depth=3).collect()
    assert all(0 <= r.bucket < 16 and r.d in (0, 1, 2) for r in sk)
    total = stream.count()
    # every depth row holds the full stream mass
    per_d = {}
    for r in sk:
        per_d[r.d] = per_d.get(r.d, 0) + r.cnt
    assert per_d == {0: total, 1: total, 2: total}


def test_estimates_one_sided(spark, stream):
    sk = countmin_sketch(stream, "k", width=16, depth=3)
    keys = stream.distinct()
    est = {r.k: r.est_cnt for r in
           countmin_estimate(sk, keys, "k", width=16, depth=3).collect()}
    exact = {r.k: r.cnt for r in
             stream.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert est.keys() == exact.keys()
    assert all(est[k] >= exact[k] for k in exact)
    # width 16 over 30 keys must collide somewhere; estimates stay finite
    assert any(est[k] > exact[k] for k in exact)


def test_wide_sketch_is_exact(spark):
    rows = [(f"u{i}",) for i in range(8) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    sk = countmin_sketch(df, "k", width=4096, depth=4)
    est = {r.k: r.est_cnt for r in
           countmin_estimate(sk, df.distinct(), "k", 4096, 4).collect()}
    assert est == {f"u{i}": i + 1 for i in range(8)}


def test_shard_sketches_merge_by_addition(spark, stream):
    half_a = stream.where(F.crc32(F.col("k")) % 2 == 0)
    half_b = stream.where(F.crc32(F.col("k")) % 2 == 1)
    merged = (countmin_sketch(half_a, "k", 16, 3)
              .unionByName(countmin_sketch(half_b, "k", 16, 3))
              .groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt")))
    whole = countmin_sketch(stream, "k", 16, 3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_null_keys_counted_under_sentinel(spark):
    df = spark.createDataFrame([(None,), ("a",), (None,)], "k string")
    sk = countmin_sketch(df, "k", width=8, depth=2)
    est = {r.k: r.est_cnt for r in
           countmin_estimate(sk, df.distinct(), "k", 8, 2).collect()}
    assert est[None] >= 2 and est["a"] >= 1


def test_bad_params_raise(spark, stream):
    with pytest.raises(ValueError):
        countmin_sketch(stream, "k", width=0, depth=2)
