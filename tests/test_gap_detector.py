"""Stateful streaming gap detector: alerts match the batch grid's holes."""

import pandas as pd

from datafiller_spark.streaming.gap_detector import detect_gaps


def test_streaming_gap_alerts(spark, tmp_path):
    # one source, minutes 0,1,2, 5,6, 10  → gaps [3,4] and [7,8,9]
    minutes = [0, 1, 2, 5, 6, 10]
    pdf = pd.DataFrame(
        {
            "source": ["web"] * len(minutes),
            "event_ts": [pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=m) for m in minutes],
            "n_tok": [10] * len(minutes),
        }
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    alerts = detect_gaps(stream, "source", "event_ts", watermark="0 seconds")
    q = (
        alerts.writeStream.outputMode("append")
        .format("memory")
        .queryName("gap_alerts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = sorted(
        (r.gap_start, r.gap_minutes) for r in spark.sql("SELECT * FROM gap_alerts").collect()
    )
    base = pd.Timestamp("2024-01-01")
    assert rows == [
        (base + pd.Timedelta(minutes=3), 2),
        (base + pd.Timedelta(minutes=7), 3),
    ]
