"""Tier encode/decode operators: distributed round-trip must be exact."""

import pytest
from pyspark.sql import functions as F

from datafiller_spark.operators import decode_tier, encode_tier, rollup
from datafiller_spark.sources import load_table


@pytest.fixture(scope="module")
def tier_1h(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    return rollup(events, ["event_type"], "ts", "value", "1h").cache()


def test_roundtrip_preserves_every_point(spark, tier_1h):
    encoded = encode_tier(tier_1h, ["event_type"], "bucket", "avg_value", "1h")
    decoded = decode_tier(encoded, ["event_type"], "bucket", "avg_value")

    orig = tier_1h.select("event_type", "bucket", "avg_value").orderBy("event_type", "bucket")
    back = decoded.orderBy("event_type", "bucket")
    a, b = orig.collect(), back.collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.event_type == rb.event_type
        assert ra.bucket == rb.bucket
        assert ra.avg_value == rb.avg_value  # float64 bit-exact through codec


def test_chunk_metadata(tier_1h):
    encoded = encode_tier(tier_1h, ["event_type"], "bucket", "avg_value", "1h")
    total = encoded.agg(F.sum("n_points")).first()[0]
    assert total == tier_1h.count()
    assert encoded.where(F.col("tier") != "1h").count() == 0


def test_compression_beats_raw(tier_1h):
    encoded = encode_tier(tier_1h, ["event_type"], "bucket", "avg_value", "1h")
    stats = encoded.agg(
        F.sum(F.length("payload")).alias("bytes"), F.sum("n_points").alias("pts")
    ).first()
    assert stats.bytes < stats.pts * 16  # strictly better than raw (ts,value) pairs
