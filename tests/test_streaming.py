"""Batch/stream parity (SURVEY §2.11): the streaming window agg over a
finite input equals the batch tumbling_window_agg on the same data."""

from pyspark.sql import functions as F

from metadata_enhanced_pretrain_datapipeline_spark.operators.aggregates import tumbling_window_agg
from metadata_enhanced_pretrain_datapipeline_spark.streaming import events as stream_events


def test_stream_matches_batch(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:05:00", "click", 1.0),
        (2, "2024-01-01 00:55:00", "click", 2.0),
        (3, "2024-01-01 01:05:00", "view", 3.0),
        (4, "2024-01-01 01:06:00", "click", 4.5),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, event_type string, value double")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "src")
    df.write.parquet(src)

    batch = tumbling_window_agg(
        spark.read.parquet(src), "ts", ["event_type"], "1 hour",
        [F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")],
    )
    batch_rows = sorted(
        (str(r.window_start), r.event_type, r.n, r.sum_value) for r in batch.collect()
    )

    stream = stream_events.windowed_counts(
        stream_events.stream_events_from_parquet(spark, src), "ts", "event_type", "1 hour"
    )
    stream_events.drain_complete_to_memory(stream, "stream_out")
    stream_rows = sorted(
        (str(r.window_start), r.event_type, r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM stream_out").collect()
    )
    assert stream_rows == batch_rows
