"""Character-bigram LM quality scoring (operators/lm.py)."""

import math

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import lm


def test_char_lm_model_counts(spark):
    df = spark.createDataFrame([(1, "abab"), (2, "ab")], "doc_id long, text string")
    model = {(r.c1, r.c2): r.c for r in lm.char_lm_model(df).collect()}
    # "abab" -> ab, ba, ab ; "ab" -> ab
    assert model == {("a", "b"): 3, ("b", "a"): 1}


def test_char_lm_score_closed_form(spark):
    df = spark.createDataFrame([(1, "abab"), (2, "ab")], "doc_id long, text string")
    model = lm.char_lm_model(df)
    got = {r.doc_id: (r.n_bigrams, r.avg_logp)
           for r in lm.char_lm_score(df, model).collect()}
    # V = |{b, a}| = 2; F(a)=3, F(b)=1
    p_ab = (3 + 1) / (3 + 2)
    p_ba = (1 + 1) / (1 + 2)
    exp1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    exp2 = round(math.log(p_ab), 4)
    assert got == {1: (3, exp1), 2: (1, exp2)}


def test_char_lm_score_unseen_chars_and_short_docs(spark):
    train = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    test = spark.createDataFrame(
        [(9, "zz"), (10, "x")], "doc_id long, text string")
    model = lm.char_lm_model(train)
    got = {r.doc_id: (r.n_bigrams, r.avg_logp)
           for r in lm.char_lm_score(test, model).collect()}
    # "zz": unseen first char -> p = 1/V = 1/2; "x" has no bigrams -> it
    # still gets its one-row-per-doc (0, NULL) row via the join-back
    assert got == {9: (1, round(math.log(0.5), 4)), 10: (0, None)}


def test_perplexity_buckets_split_in_thirds(spark):
    """CCNet head/middle/tail partition: bucket sizes differ by at most
    one, and every head doc scores >= every tail doc."""
    rows = [(i, ("the cat sat on the mat " * (1 + i % 3)).strip()
             + f" tail{i}qz"[: 4 + i % 5]) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    from metadata_enhanced_pretrain_datapipeline_spark.operators import sampling
    from pyspark.sql import functions as F

    scores = lm.char_lm_score(df, lm.char_lm_model(df)).filter(
        F.col("n_bigrams") > 0)
    ranked, total = sampling.global_rank(
        scores, [F.col("avg_logp"), F.col("doc_id")], with_total=True)
    bucket = F.floor(((F.col("pos") - 1) * 3) / F.lit(total)).cast("int")
    out = ranked.select("doc_id", "avg_logp", bucket.alias("b")).collect()
    sizes = {b: sum(1 for r in out if r.b == b) for b in (0, 1, 2)}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert min(r.avg_logp for r in out if r.b == 2) >= \
        max(r.avg_logp for r in out if r.b == 0)


def test_garbage_scores_below_typical(spark):
    rows = [(i, "the cat sat on the mat and the dog sat too") for i in range(5)]
    rows.append((99, "qqxzvkjqq zzkklp qqq"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_logp
           for r in lm.char_lm_score(df, lm.char_lm_model(df)).collect()}
    typical = [v for k, v in out.items() if k != 99]
    assert out[99] < min(typical)  # garbage ranks lowest
