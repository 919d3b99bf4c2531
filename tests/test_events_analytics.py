"""Funnel ordering semantics and cohort retention arithmetic."""

import datetime as dt

from metadata_enhanced_pretrain_datapipeline_spark.operators import events_analytics as ea


def _ts(h):
    return dt.datetime(2026, 1, 1) + dt.timedelta(hours=h)


def test_funnel_requires_strict_order(spark):
    rows = [
        # u1 completes all three in order
        (1, _ts(0), "signup"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # u2 clicks BEFORE signing up -> stops at signup
        (2, _ts(5), "click"), (2, _ts(6), "signup"),
        # u3 purchase before click -> reaches click only
        (3, _ts(0), "signup"), (3, _ts(1), "purchase"), (3, _ts(2), "click"),
        # u4 never signs up
        (4, _ts(0), "click"), (4, _ts(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage: r.n_users for r in
           ea.funnel_counts(df, ["signup", "click", "purchase"]).collect()}
    assert out == {"signup": 3, "click": 2, "purchase": 1}


def test_funnel_earliest_completion_maximizes_reach(spark):
    # signup at t0 and t4; click at t2. Greedy-from-earliest signup (t0)
    # sees the t2 click; anchoring on the LAST signup would miss it.
    rows = [(1, _ts(0), "signup"), (1, _ts(4), "signup"), (1, _ts(2), "click")]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.stage: r.n_users for r in
           ea.funnel_counts(df, ["signup", "click"]).collect()}
    assert out == {"signup": 1, "click": 1}


def test_cohort_retention_offsets(spark):
    wk = 7 * 24
    rows = [
        (1, _ts(0), "view"), (1, _ts(wk + 1), "view"),      # offsets 0, 1
        (1, _ts(wk + 2), "view"),                           # same week: distinct
        (2, _ts(wk), "view"),                               # later cohort, offset 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in ea.cohort_retention(df).collect()}
    weeks = sorted({c for c, _ in out})
    w0, w1 = weeks[0], weeks[-1]
    assert out[(w0, 0)] == 1 and out[(w0, 1)] == 1 and out[(w1, 0)] == 1
    assert len(out) == 3
