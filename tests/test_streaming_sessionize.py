"""Stateful streaming sessionization: closed sessions emitted across
micro-batches, state carried between them."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.streaming import events as se


def test_streaming_sessionize_closes_sessions(spark, tmp_path):
    # user 1: two sessions (gap 2h); user 2: one session — then a late
    # "far future" event pushes the watermark so earlier sessions time out.
    rows = [
        (1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
        (1, "2024-01-01 03:00:00"),
        (2, "2024-01-01 00:00:00"),
        (3, "2024-01-02 12:00:00"),  # watermark pusher
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    src = str(tmp_path / "src")
    df.write.parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    sessions = se.streaming_sessionize(stream, gap_seconds=1800, watermark="1 minute")
    q = (
        sessions.writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, str(r.session_start), r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    # user 1's first session (2 events) closed by the 03:00 event's gap;
    # remaining sessions close via event-time timeout from the watermark.
    assert (1, "2024-01-01 00:00:00", 2) in got
    assert (1, "2024-01-01 03:00:00", 1) in got
    assert (2, "2024-01-01 00:00:00", 1) in got


def test_builtin_session_window_merges_exact_gap_boundary(spark):
    """Spark's session_window MERGES two events exactly gap apart (the
    q_session_window_native oracle's strict-> break encodes this; if a
    Spark upgrade ever flips the boundary, this fails before the oracle
    does)."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(minutes=30))], "user_id long, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n")).collect()
    )
    assert len(out) == 1 and out[0].n == 2
