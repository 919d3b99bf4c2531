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


def test_c4_line_filter_rules(spark):
    docs = [
        # kept: two qualifying lines; short + no-punct + javascript lines drop
        (1, "This line is fine.\nshort.\nno terminal punct here\n"
            "beware javascript tricks here.\nAnother good line stays!"),
        (2, "all lines lack punctuation\nso nothing survives here"),
        (3, "Code pages are dropped entirely. { var x = 1; }"),
        (4, "Lorem Ipsum dolor sit amet."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: (r.n_lines_kept, r.text)
           for r in filters.c4_line_filter(df).collect()}
    assert set(out) == {1}
    n, text = out[1]
    assert n == 2
    assert text == "This line is fine.\nAnother good line stays!"


def test_c4_line_filter_min_lines_gate(spark):
    df = spark.createDataFrame(
        [(1, "Only one good line survives this document.")],
        "doc_id long, text string")
    assert filters.c4_line_filter(df, min_lines=2).count() == 0
    assert filters.c4_line_filter(df, min_lines=1).count() == 1


def test_stratified_hash_sample_rates_and_determinism(spark):
    from pyspark.sql import functions as F

    from metadata_enhanced_pretrain_datapipeline_spark.operators import filters

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "id long, s string")
    out = filters.stratified_hash_sample(
        df, F.col("id"), F.col("s"), {"a": 1.0, "b": 0.25}, default_rate=0.0)
    rows = out.collect()
    a = sum(1 for r in rows if r.s == "a")
    b = sum(1 for r in rows if r.s == "b")
    assert a == 1000                      # rate 1.0 keeps every 'a'
    assert 150 < b < 350                  # ~25% of 1000, hash-exact
    again = filters.stratified_hash_sample(
        df, F.col("id"), F.col("s"), {"a": 1.0, "b": 0.25}, default_rate=0.0)
    assert sorted((r.id for r in rows)) == sorted((r.id for r in again.collect()))
    # unknown stratum with default 0 -> dropped
    df2 = spark.createDataFrame([(1, "zz")], "id long, s string")
    assert filters.stratified_hash_sample(
        df2, F.col("id"), F.col("s"), {"a": 1.0}).count() == 0
