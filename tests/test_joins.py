from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators import joins


def _ts(df, col):
    return df.withColumn(col, F.to_timestamp(col))


def test_asof_join_latest_prior(spark):
    events = _ts(
        spark.createDataFrame(
            [
                (1, 10, "2024-01-01 12:00:00"),
                (2, 10, "2024-01-01 13:00:00"),
                (3, 20, "2024-01-01 12:00:00"),
            ],
            "event_id long, k long, ts string",
        ),
        "ts",
    )
    orders = _ts(
        spark.createDataFrame(
            [
                (100, 10, "2024-01-01 11:00:00"),
                (101, 10, "2024-01-01 12:30:00"),
                (102, 30, "2024-01-01 00:00:00"),
            ],
            "okey long, k long, ots string",
        ),
        "ots",
    )
    out = joins.asof_join(events, orders, "k", "k", "ts", "ots", ["okey"]).collect()
    got = {r.event_id: r.okey for r in out}
    assert got == {1: 100, 2: 101, 3: None}  # left semantics: unmatched kept


def test_asof_join_boundary_inclusive(spark):
    """An order landing exactly at the event ts is visible (<=)."""
    events = _ts(spark.createDataFrame([(1, 1, "2024-01-01 12:00:00")],
                                       "event_id long, k long, ts string"), "ts")
    orders = _ts(spark.createDataFrame([(7, 1, "2024-01-01 12:00:00")],
                                       "okey long, k long, ots string"), "ots")
    out = joins.asof_join(events, orders, "k", "k", "ts", "ots", ["okey"]).collect()
    assert out[0].okey == 7


def test_broadcast_lookup(spark):
    fact = spark.createDataFrame([("a", 1), ("b", 2)], "d string, v int")
    dim = spark.createDataFrame([("a", "A")], "d string, name string")
    out = joins.broadcast_lookup(fact, dim, "d").collect()
    got = {r.d: r.name for r in out}
    assert got == {"a": "A", "b": None}


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k, i) for i in range(200) for k in (["hot"] if i % 2 else ["k" + str(i)])],
        "key string, v long",
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k4", 2), ("k10", 3)], "key string, w long"
    )
    plain = sorted(map(tuple, left.join(right, "key").collect()))
    salted = sorted(map(tuple, joins.salted_join(left, right, "key").collect()))
    assert salted == plain and len(plain) >= 100


def test_salted_join_rejects_right_join(spark):
    import pytest

    left = spark.createDataFrame([("a", 1)], "key string, v int")
    with pytest.raises(ValueError):
        joins.salted_join(left, left, "key", how="right")


def test_asof_join_duplicate_ts_deterministic(spark):
    events = _ts(spark.createDataFrame([(1, 1, "2024-01-01 12:00:00")],
                                       "event_id long, k long, ts string"), "ts")
    orders = _ts(spark.createDataFrame(
        [(7, 1, "2024-01-01 11:00:00"), (9, 1, "2024-01-01 11:00:00")],
        "okey long, k long, ots string"), "ots")
    vals = {joins.asof_join(events, orders, "k", "k", "ts", "ots", ["okey"])
            .collect()[0].okey for _ in range(3)}
    assert vals == {9}  # ties resolved to the greatest value tuple, every run


def test_skew_safe_count_distinct_matches_countDistinct(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import aggregates

    rows = [(1, "a", 10), (2, "a", 10), (3, "a", 11), (4, "b", None),
            (5, "b", 12), (6, "b", 12)]
    df = spark.createDataFrame(rows, "id long, k string, v int")
    got = {r.k: r.n_distinct for r in
           aggregates.skew_safe_count_distinct(df, ["k"], "v").collect()}
    want = {r.k: r.n for r in
            df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()}
    assert got == want == {"a": 2, "b": 1}  # NULL not counted


def test_range_join_matches_naive_between(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import joins as J

    pts = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([0.0, 5.0, 10.0, 10.5, 25.0, -3.0])],
        "pid long, x double")
    iv = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, 10.0, 20.0), (3, -5.0, -1.0), (4, 9.0, 11.0)],
        "iid long, lo double, hi double")
    got = sorted((r.pid, r.iid) for r in
                 J.range_join(pts, "x", iv, "lo", "hi", bin_width=4.0).collect())
    naive = pts.crossJoin(iv).filter("x >= lo AND x <= hi")
    want = sorted((r.pid, r.iid) for r in naive.collect())
    assert got == want
    # boundary inclusivity: x=10.0 matches [0,10], [10,20] AND [9,11]
    assert sum(1 for p, _ in got if p == 2) == 3


def test_range_join_shuffle_strategy_pins_plan_and_matches(spark):
    """strategy='shuffle' must produce the same pairs as auto AND carry a
    ShuffledHashJoin (no BroadcastHashJoin) — the guard against Catalyst
    mis-broadcasting a bin-exploded interval table it size-estimated
    pre-explode."""
    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.operators import joins as J

    pts = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "pid long, x double")
    iv = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 4.0, 9.0)], "iid long, lo double, hi double")
    auto = J.range_join(pts, "x", iv, "lo", "hi", bin_width=2.0)
    pinned = J.range_join(pts, "x", iv, "lo", "hi", bin_width=2.0,
                          strategy="shuffle")
    assert sorted((r.pid, r.iid) for r in auto.collect()) == \
        sorted((r.pid, r.iid) for r in pinned.collect())
    plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan and "BroadcastHashJoin" not in plan
    with pytest.raises(ValueError, match="strategy"):
        J.range_join(pts, "x", iv, "lo", "hi", bin_width=2.0, strategy="nope")


def test_range_join_oversized_interval_fails_fast(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from metadata_enhanced_pretrain_datapipeline_spark.operators import joins as J

    pts = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    iv = spark.createDataFrame([(1, 0.0, 1e9)], "iid long, lo double, hi double")
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        J.range_join(pts, "x", iv, "lo", "hi", bin_width=1.0,
                     max_bins_per_interval=100).collect()


def test_skew_safe_count_distinct_all_null_group_is_zero(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import aggregates

    rows = [(1, "a", 10), (2, "c", None), (3, "c", None), (4, None, 5)]
    df = spark.createDataFrame(rows, "id long, k string, v int")
    got = {r.k: r.n_distinct for r in
           aggregates.skew_safe_count_distinct(df, ["k"], "v").collect()}
    # all-NULL group surfaces with 0 (COUNT DISTINCT semantics); a NULL
    # key is a group of its own
    assert got == {"a": 1, "c": 0, None: 1}


def test_range_join_null_and_nan_intervals_drop(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import joins as J

    pts = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    iv = spark.createDataFrame(
        [(1, 0.0, 10.0), (2, None, 10.0), (3, 0.0, None),
         (4, float("nan"), 10.0)],
        "iid long, lo double, hi double")
    got = [r.iid for r in
           J.range_join(pts, "x", iv, "lo", "hi", bin_width=4.0).collect()]
    assert got == [1]   # NULL/NaN bounds never match — and never crash


def test_merge_upsert_overrides_and_passthrough(spark):
    from metadata_enhanced_pretrain_datapipeline_spark.operators import joins

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    updates = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id long, v string")
    out = {r.id: r.v for r in joins.merge_upsert(base, updates, ["id"]).collect()}
    assert out == {1: "a", 2: "B2", 3: "c", 4: "d"}


def test_salted_join_strategies_agree_and_pin_their_plans(spark):
    """Both pinned strategies keep the never-broadcast contract and
    agree row-for-row: the DEFAULT is the spill-safe sort-merge build
    (the sf10 probe's memory-floor finding, SCALE.md — SHJ OOMs at
    250 MB/core and runs 3.1x slower at 48 GB); shuffle_hash remains
    the bounded-build opt-in. Invalid strategies (incl. broadcast)
    are rejected."""
    import pytest

    from metadata_enhanced_pretrain_datapipeline_spark.operators import joins

    left = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], "id long, k long")
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k long, v string")
    default_df = joins.salted_join(left, right, "k")
    shj_df = joins.salted_join(left, right, "k", strategy="shuffle_hash")
    default_rows = {(r.id, r.v) for r in default_df.collect()}
    shj_rows = {(r.id, r.v) for r in shj_df.collect()}
    assert default_rows == shj_rows and len(default_rows) == 60
    dplan = default_df._jdf.queryExecution().executedPlan().toString()
    splan = shj_df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in dplan and "BroadcastHashJoin" not in dplan
    assert "ShuffledHashJoin" in splan and "BroadcastHashJoin" not in splan
    with pytest.raises(ValueError, match="shuffle_hash"):
        joins.salted_join(left, right, "k", strategy="broadcast")
