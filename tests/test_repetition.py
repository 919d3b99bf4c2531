"""functions/text.repetition_signals — Gopher-style duplicate-line
signals, hand-computed expectations."""

import pytest
from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.functions.text import repetition_signals


def _sig(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(repetition_signals(F.col("text")).alias("s")).collect()[0]["s"]
    return row["dup_line_frac"], row["dup_line_char_frac"]


def test_no_duplicates(spark):
    frac, char_frac = _sig(spark, "alpha\nbeta\ngamma")
    assert frac == 0.0 and char_frac == 0.0


def test_half_duplicate_lines(spark):
    # 4 lines, "aa" twice: dup_line_frac = (4-3)/4; chars 2+2+3+4=11, dup 4
    frac, char_frac = _sig(spark, "aa\naa\nbbb\ncccc")
    assert frac == pytest.approx(0.25)
    assert char_frac == pytest.approx(4 / 11)


def test_blank_and_whitespace_lines_ignored(spark):
    # blank/whitespace-only lines are dropped before counting; the two
    # identical 'x' lines still count as duplicates
    frac, char_frac = _sig(spark, "x\n\n   \nx")
    assert frac == pytest.approx(0.5)
    assert char_frac == pytest.approx(1.0)


def test_trimmed_before_compare(spark):
    # trim happens before equality: ' a ' and 'a' are the same line
    frac, _ = _sig(spark, " a \na")
    assert frac == pytest.approx(0.5)


def test_empty_and_null_text(spark):
    assert _sig(spark, "") == (None, None)
    df = spark.createDataFrame([(None,)], "text string")
    row = df.select(repetition_signals(F.col("text")).alias("s")).collect()[0]["s"]
    assert row is None or (row["dup_line_frac"] is None and row["dup_line_char_frac"] is None)


def test_all_one_line_repeated(spark):
    frac, char_frac = _sig(spark, "spam\nspam\nspam")
    assert frac == pytest.approx(2 / 3)
    assert char_frac == pytest.approx(1.0)


def test_ngram_repetition_hand_computed(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
        ngram_repetition_signals,
    )

    # "a b c a b c a b x": 2-gram "a b" occurs 3x (ties impossible: "b c"
    # 2x). top chars = 3 * len("ab") = 6 over 9 token chars.
    # 5-grams: "a b c a b" (starts 1,4) duplicated -> covers positions
    # 1..8 (union of [1,5] and [4,8]); position 9 ("x") uncovered ->
    # dup frac = 8/9.
    df = spark.createDataFrame([(1, "a b c a b c a b x")],
                               "id long, text string")
    s = df.select(ngram_repetition_signals(
        F.col("text"), top_n=2, dup_n=5).alias("s")).head()["s"]
    assert abs(s["top_ngram_char_frac"] - 6 / 9) < 1e-9
    assert abs(s["dup_ngram_char_frac"] - 8 / 9) < 1e-9


def test_ngram_repetition_short_docs_null_no_dups_zero(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
        ngram_repetition_signals,
    )

    df = spark.createDataFrame(
        [(1, "only"), (2, "all words here differ fully now")],
        "id long, text string")
    rows = {r.id: r["s"] for r in df.select(
        "id", ngram_repetition_signals(F.col("text")).alias("s")).collect()}
    assert rows[1]["top_ngram_char_frac"] is None   # < 2 tokens
    assert rows[1]["dup_ngram_char_frac"] is None   # < 5 tokens
    assert rows[2]["top_ngram_char_frac"] is not None  # max count 1 still tops
    assert rows[2]["dup_ngram_char_frac"] == 0.0    # no duplicated 5-gram
