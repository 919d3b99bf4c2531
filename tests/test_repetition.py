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


def test_gopher_quality_signals_hand_computed(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
        gopher_quality_signals,
    )
    from pyspark.sql import functions as F

    # 3 non-empty lines: one bullet, one ellipsis ending; 9 ws tokens,
    # 7 with a letter ('-' and '42' have none); symbols: 1 '#', 1 '...'
    text = "- alpha beta\ngamma 42 #tag\nwait for it..."
    df = spark.createDataFrame([(1, text)], "id long, text string")
    s = df.select(gopher_quality_signals(F.col("text")).alias("s")).head()["s"]
    assert abs(s["alpha_word_frac"] - 7 / 9) < 1e-6
    assert abs(s["bullet_line_frac"] - 1 / 3) < 1e-6
    assert abs(s["ellipsis_line_frac"] - 1 / 3) < 1e-6
    assert abs(s["symbol_word_ratio"] - 2 / 9) < 1e-6


def test_gopher_quality_keep_thresholds(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.functions.text import (
        gopher_quality_keep,
    )
    from pyspark.sql import functions as F

    good = "the quick brown fox is one of the best and a joy to watch in"
    soup = " ".join(["####"] * 20)  # no alpha words, symbol flood
    df = spark.createDataFrame(
        [(1, good), (2, soup), (3, "")], "id long, text string")
    rows = {r.id: r.k for r in df.select(
        "id", gopher_quality_keep(F.col("text"), min_words=10).alias("k")
    ).collect()}
    assert rows[1] is True
    assert rows[2] is False
    assert rows[3] is False  # empty doc: NULL signals -> dropped
