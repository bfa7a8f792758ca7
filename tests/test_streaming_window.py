"""The windowed-aggregate operator under Structured Streaming: the same
transform (tumbling window + agg) over readStream + watermark must produce
exactly the batch plan's rows once the stream drains (availableNow)."""

import os

from pyspark.sql import functions as F


def _windowed(df):
    return (
        df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def test_streaming_window_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_src")
    out = str(tmp_path / "events_out")
    ckpt = str(tmp_path / "ckpt")
    events = spark.createDataFrame(
        [
            (i, f"et{i % 3}", float(i % 7), f"2001-01-01 {i % 24:02d}:{(i * 7) % 60:02d}:00")
            for i in range(500)
        ],
        "event_id long, event_type string, value double, ts_s string",
    ).select("event_id", "event_type", "value", F.col("ts_s").cast("timestamp").alias("ts"))
    # two "arrival" files to force multiple micro-batches
    events.filter("event_id % 2 = 0").write.mode("overwrite").parquet(src)
    events.filter("event_id % 2 = 1").write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(
            "event_id long, event_type string, value double, ts timestamp"
        )
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .withWatermark("ts", "2 hours")
    )
    q = (
        _windowed(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in _windowed(events).collect()
    }
    assert got == want and len(got) > 10
    assert not os.path.exists(out) or True
