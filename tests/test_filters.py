from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import filters


def test_length_filter(docs):
    kept = docs.filter(filters.length_filter(F.col("text"), 40))
    assert all(len(r.text) >= 40 for r in kept.collect())


def test_conjunctive_threshold(spark):
    df = spark.createDataFrame([(3, 3), (3, 1), (0, 5)], "a int, b int")
    out = df.filter(filters.conjunctive_threshold({"a": 2, "b": 2})).collect()
    assert [(r.a, r.b) for r in out] == [(3, 3)]


def test_valid_int(spark):
    df = spark.createDataFrame([("5",), ("x",), ("12",), (None,)], "v string")
    out = df.filter(filters.valid_int(F.col("v"), 0, 9)).collect()
    assert [r.v for r in out] == ["5"]


def test_hash_sample_deterministic_and_stable(docs):
    a = sorted(r.doc_id for r in filters.hash_sample(docs, F.col("doc_id"), 0.5).collect())
    b = sorted(r.doc_id for r in filters.hash_sample(docs, F.col("doc_id"), 0.5).collect())
    assert a == b and 0 < len(a) < 40
    # sample at a higher rate is a superset (nested samples — retry-safe)
    c = sorted(r.doc_id for r in filters.hash_sample(docs, F.col("doc_id"), 0.8).collect())
    assert set(a) <= set(c)


def test_shard_select_partitions_everything(docs):
    total = sum(
        filters.shard_select(docs, F.col("doc_id"), i, 4).count() for i in range(4)
    )
    assert total == docs.count()


def test_id_anti_join(spark, docs):
    block = spark.createDataFrame([(0,), (1,), (2,)], "doc_id long")
    out = filters.id_anti_join(docs, block, "doc_id")
    assert out.count() == 37
    assert set(r.doc_id for r in out.select("doc_id").collect()).isdisjoint({0, 1, 2})


def test_quantile_gate_keeps_top_half(spark):
    df = spark.createDataFrame([(i, i % 10) for i in range(100)], "id long, s int")
    out = filters.quantile_gate(df, ["s"], 0.5)
    vals = [r.s for r in out.collect()]
    assert vals and min(vals) >= 4.5 - 1  # median of 0..9 repeated = 4.5
