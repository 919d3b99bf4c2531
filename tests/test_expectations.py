"""expectations operator: summary counts, NULL handling, row flagging."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import expectations as ex


def _df(spark):
    return spark.createDataFrame(
        [(1, "hello", 10), (2, None, 5), (3, "ok", None), (4, "fine", 2)],
        "id long, txt string, score int")


def test_expectation_summary_counts_and_null_as_violation(spark):
    rules = [
        ("txt_present", F.col("txt").isNotNull()),
        ("score_low", F.col("score") < 8),     # NULL score (row 3) violates
        ("id_positive", F.col("id") > 0),
    ]
    out = {r.rule: (r.n_violations, r.passed)
           for r in ex.expectation_summary(_df(spark), rules).collect()}
    assert out == {"txt_present": (1, False),
                   "score_low": (2, False),    # row 1 (10) + row 3 (NULL)
                   "id_positive": (0, True)}


def test_flag_violations_arrays(spark):
    rules = [("txt_present", F.col("txt").isNotNull()),
             ("score_low", F.col("score") < 8)]
    out = {r.id: r.failed_rules
           for r in ex.flag_violations(_df(spark), rules).collect()}
    assert out == {1: ["score_low"], 2: ["txt_present"],
                   3: ["score_low"], 4: []}


def test_expectation_summary_empty_corpus_passes(spark):
    from pyspark.sql import functions as F

    empty = spark.createDataFrame([], "id long, txt string")
    out = ex.expectation_summary(empty, [("txt_present", F.col("txt").isNotNull())]).collect()
    assert [(r.rule, r.n_violations, r.passed) for r in out] == [
        ("txt_present", 0, True)]
