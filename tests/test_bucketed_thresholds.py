from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import filters
from metadata_enhanced_pretrain_datapipeline_spark.sources.writers import write_bucketed


def test_per_key_threshold_filter(spark):
    df = spark.createDataFrame(
        [(1, "en", 0.95), (2, "en", 0.9995), (3, "de", 0.8), (4, "xx", 0.4)],
        "id long, lang string, score double",
    )
    out = filters.per_key_threshold_filter(
        df, "lang", F.col("score"), {"en": 0.9994, "de": 0.7446}, default=0.5
    )
    assert sorted(r.id for r in out.collect()) == [1, 4]


def test_bucketed_join_has_no_shuffle(spark, docs, tmp_path):
    """Two tables bucketed on the same key join without an Exchange —
    the co-located-join property write_bucketed exists for."""
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", "source")
    write_bucketed(left, "t_left", ["doc_id"], 4, path=str(tmp_path / "l"))
    write_bucketed(right, "t_right", ["doc_id"], 4, path=str(tmp_path / "r"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # tiny test tables would auto-broadcast; force the SMJ path the
        # bucketing exists for (at 100 TB neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_left").join(spark.table("t_right"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucket layout makes the join shuffle-free
        assert "SortMergeJoin" in plan
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE t_left")
        spark.sql("DROP TABLE t_right")


def test_equi_width_histogram_bins_and_degenerate(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import aggregates

    df = spark.createDataFrame([(float(v),) for v in range(0, 100)], "v double")
    out = {r.bin: (r.bin_lo, r.n) for r in
           aggregates.equi_width_histogram(df, "v", 10).collect()}
    assert len(out) == 10
    # v in [0, 99]; width 9.9 -> bin 9 holds [89.1, 99] = 10 values incl max
    assert out[0][0] == 0.0 and out[0][1] == 10
    assert out[9][1] == 10
    assert sum(n for _, n in out.values()) == 100
    # degenerate: constant column -> single bin 0, no div-by-zero
    const = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "v double")
    got = aggregates.equi_width_histogram(const, "v", 10).collect()
    assert len(got) == 1 and got[0].bin == 0 and got[0].n == 3


def test_equi_width_histogram_excludes_null_and_nan(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import aggregates

    df = spark.createDataFrame(
        [(float(v),) for v in range(10)] + [(None,), (None,), (float("nan"),)],
        "v double")
    out = {r.bin: r.n for r in
           aggregates.equi_width_histogram(df, "v", 10).collect()}
    # 10 real values, one per bin; NULL/NaN must NOT inflate the top bin
    assert out[9] == 1
    assert sum(out.values()) == 10
