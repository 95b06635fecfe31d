"""Streaming 1m rollup == batch rollup on the same data."""

import pytest
from pyspark.sql import functions as F

from datafiller_spark.operators import rollup
from datafiller_spark.sources import load_table
from datafiller_spark.streaming import start_rollup_stream


def test_streaming_rollup_matches_batch(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = start_rollup_stream(
        stream,
        ["event_type"],
        "ts",
        "value",
        checkpoint_dir=str(tmp_path / "ckpt"),
        query_name="t1m_test",
        watermark="0 seconds",
    )
    q.awaitTermination(120)

    streamed = spark.sql(
        "SELECT event_type, bucket, n_points, sum_value FROM t1m_test"
    ).collect()
    batch = (
        rollup(events, ["event_type"], "ts", "value", "1m")
        .select("event_type", "bucket", "n_points", "sum_value")
        .collect()
    )
    s = sorted((r.event_type, r.bucket, r.n_points, round(r.sum_value, 6)) for r in streamed)
    b = sorted((r.event_type, r.bucket, r.n_points, round(r.sum_value, 6)) for r in batch)
    assert s == b
