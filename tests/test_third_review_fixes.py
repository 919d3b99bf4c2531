"""Regression tests for the third self-review pass."""

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.arrays import cosine_similarity
from metadata_enhanced_pretrain_datapipeline_spark.functions.text import quality_stats
from metadata_enhanced_pretrain_datapipeline_spark.functions.urlf import url_host
from metadata_enhanced_pretrain_datapipeline_spark.operators import dedup, joins, robots, segment


def test_quality_stats_empty_text_no_crash(spark):
    df = spark.createDataFrame([("",), ("   ",), ("real text",)], "text string")
    stats = quality_stats(F.col("text"))
    out = df.select(stats["avg_token_len"].alias("a"), stats["stopword_ratio"].alias("s")).collect()
    assert out[0].a is None and out[1].a is None  # NULL, not DIVIDE_BY_ZERO
    assert out[2].a is not None


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<float>, b array<float>"
    )
    out = df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()
    assert out[0].c is None


def test_asof_join_null_fields_stay_atomic(spark):
    def _ts(df, c):
        return df.withColumn(c, F.to_timestamp(c))

    events = _ts(spark.createDataFrame([(1, 1, "2024-01-01 03:00:00")],
                                       "event_id long, k long, ts string"), "ts")
    orders = _ts(spark.createDataFrame(
        [(100.0, None, 1, "2024-01-01 01:00:00"),
         (None, 5.0, 1, "2024-01-01 02:00:00")],
        "price double, qty double, k long, ots string"), "ots")
    out = joins.asof_join(events, orders, "k", "k", "ts", "ots", ["price", "qty"]).collect()[0]
    # the matched row is the ts=02:00 one ATOMICALLY — price must be NULL,
    # not stitched from the stale ts=01:00 row
    assert out.price is None and out.qty == 5.0


def test_segment_blocks_string_doc_ids(spark):
    df = spark.createDataFrame(
        [("docA", 0, "aa", True), ("docA", 1, "bb", True), ("docB", 0, "cc", True)],
        "doc string, idx long, txt string, ok boolean",
    )
    out = segment.segment_blocks(df, "doc", "idx", "txt", max_length=100, valid_col="ok")
    assert sorted((r.doc, r.text) for r in out.collect()) == [("docA", "aa bb"), ("docB", "cc")]


def test_robots_join_duplicate_domains_no_fanout(spark):
    docs = spark.createDataFrame([(1, "https://a.com/x")], "doc_id long, url string")
    rob = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /\n"), ("a.com", "User-agent: *\nDisallow: /\n")],
        "domain string, content string",
    )
    assert robots.robots_filter_join(docs, rob).count() == 1


def test_uppercase_scheme_host_extracted(spark):
    df = spark.createDataFrame([("HTTP://A.com/x",)], "url string")
    assert df.select(url_host(F.col("url")).alias("h")).collect()[0].h == "A.com"


def test_minhash_bands_divisibility_validated(spark, docs):
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=5)
