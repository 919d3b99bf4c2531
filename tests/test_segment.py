import pandas as pd
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import segment


def _seg(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc long, idx long, txt string, ok boolean")
    return segment.segment_blocks(
        df, "doc", "idx", "txt", valid_col="ok", **kw
    ).collect()


def test_blocks_respect_max_length(spark):
    rows = [(1, i, "aaaa", True) for i in range(10)]  # 4 chars each, +1 sep
    out = _seg(spark, rows, max_length=14)
    # 14 chars fits 3 rows ("aaaa aaaa aaaa"); 10 rows -> blocks of 3,3,3,1
    assert sorted(r.n_rows for r in out) == [1, 3, 3, 3]
    assert all(len(r.text) <= 14 for r in out)


def test_invalid_row_breaks_and_drops(spark):
    rows = [(1, 0, "aa", True), (1, 1, "bb", False), (1, 2, "cc", True)]
    out = _seg(spark, rows, max_length=100)
    texts = sorted(r.text for r in out)
    assert texts == ["aa", "cc"]  # bb dropped AND breaks the block


def test_gap_breaks_block(spark):
    rows = [(1, 0, "aa", True), (1, 1, "bb", True), (1, 10, "cc", True)]
    out = _seg(spark, rows, max_length=100, max_gap=2)
    assert sorted(r.text for r in out) == ["aa bb", "cc"]


def test_rows_conserved_across_docs(spark):
    rows = [(d, i, "tok", True) for d in range(5) for i in range(7)]
    out = _seg(spark, rows, max_length=10**9)
    assert sum(r.n_rows for r in out) == 35


def test_session_breaks_islands(spark):
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 02:00:00"),  # > 30 min gap -> new session
        (2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = segment.session_breaks(df, "user_id", "ts", 1800)
    per_user = (
        out.groupBy("user_id").agg(F.max("session_id").alias("m")).collect()
    )
    assert {r.user_id: r.m for r in per_user} == {1: 1, 2: 0}


def test_oversized_row_kept_as_own_block(spark):
    rows = [(1, 0, "aa", True), (1, 1, "x" * 50, True), (1, 2, "bb", True)]
    out = _seg(spark, rows, max_length=10)
    texts = sorted(r.text for r in out)
    assert texts == ["aa", "bb", "x" * 50]  # oversized row preserved, alone

