"""Rollup, cascade, and grid operators against real test tables."""

import datetime

import pytest
from pyspark.sql import functions as F

from datafiller_spark.operators import cascade, regular_grid, rollup
from datafiller_spark.sources import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def test_rollup_1m_counts_match_total(events):
    tier = rollup(events, ["event_type"], "ts", "value", "1m")
    assert tier.agg(F.sum("n_points")).first()[0] == events.where(F.col("value").isNotNull()).count()


def test_rollup_bucket_is_minute_aligned(events):
    tier = rollup(events, ["event_type"], "ts", "value", "1m")
    bad = tier.where(F.second("bucket") != 0).count()
    assert bad == 0


def test_cascade_equals_direct_rollup(events):
    """1m→1h cascade must equal rolling up raw directly at 1h."""
    tier_1m = rollup(events, ["event_type"], "ts", "value", "1m")
    via_cascade = cascade(tier_1m, ["event_type"], "1h").orderBy("event_type", "bucket")
    direct = rollup(events, ["event_type"], "ts", "value", "1h").orderBy("event_type", "bucket")

    a = via_cascade.select("event_type", "bucket", "n_points", "min_value", "max_value").collect()
    b = direct.select("event_type", "bucket", "n_points", "min_value", "max_value").collect()
    assert a == b

    # float sums compose to near machine precision
    sums_a = [r.sum_value for r in via_cascade.select("sum_value").collect()]
    sums_b = [r.sum_value for r in direct.select("sum_value").collect()]
    assert all(abs(x - y) <= 1e-9 * max(1.0, abs(x)) for x, y in zip(sums_a, sums_b))


def test_cascade_1d(events):
    tier_1m = rollup(events, ["event_type"], "ts", "value", "1m")
    tier_1h = cascade(tier_1m, ["event_type"], "1h")
    tier_1d = cascade(tier_1h, ["event_type"], "1d")
    direct = rollup(events, ["event_type"], "ts", "value", "1d")
    assert tier_1d.count() == direct.count()
    assert tier_1d.agg(F.sum("n_points")).first()[0] == direct.agg(F.sum("n_points")).first()[0]


def test_regular_grid_completes_calendar(spark):
    rows = [
        ("a", datetime.datetime(2024, 1, 1, 0, 0), 1.0),
        ("a", datetime.datetime(2024, 1, 1, 0, 5), 2.0),
        ("b", datetime.datetime(2024, 1, 1, 0, 2), 3.0),
        ("b", datetime.datetime(2024, 1, 1, 0, 3), 4.0),
    ]
    df = spark.createDataFrame(rows, ["key", "bucket", "value"])
    grid = regular_grid(df, ["key"], "bucket", "1m").orderBy("key", "bucket")
    got = grid.collect()
    a_rows = [r for r in got if r.key == "a"]
    assert len(a_rows) == 6  # 00:00..00:05 inclusive
    assert sum(r.value is None for r in a_rows) == 4
    b_rows = [r for r in got if r.key == "b"]
    assert len(b_rows) == 2 and all(r.value is not None for r in b_rows)


def test_grid_on_real_rollup(events):
    tier = rollup(events, ["event_type"], "ts", "value", "1h")
    grid = regular_grid(tier, ["event_type"], "bucket", "1h")
    spans = (
        grid.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            ((F.unix_timestamp(F.max("bucket")) - F.unix_timestamp(F.min("bucket"))) / 3600 + 1).alias(
                "expected"
            ),
        )
        .collect()
    )
    for r in spans:
        assert r.n == int(r.expected)


def test_rollup_partitioning_contract(spark, sf_dir):
    """BASELINE.md tier-parity contract: integer metrics bit-identical
    across partitionings; double sums equal after rounding to 4 decimals;
    the model path is order-deterministic given tier rows."""
    from datafiller_spark.operators import model_gapfill
    from datafiller_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")

    def tier_rows(n_part):
        t = rollup(events.repartition(n_part), ["event_type"], "ts", "value", "1h")
        return {
            (r.event_type, r.bucket): r
            for r in t.collect()
        }

    a, b = tier_rows(1), tier_rows(64)
    assert a.keys() == b.keys()
    for key in a:
        ra, rb = a[key], b[key]
        # level 1: integer-composable metrics are exact
        assert (ra.n_points, ra.min_value, ra.max_value) == (rb.n_points, rb.min_value, rb.max_value)
        # level 2: double sums equal after the 4-decimal rounding policy
        assert round(ra.sum_value, 4) == round(rb.sum_value, 4)

    # level 3: identical tier rows → bit-identical model gap-fill at any
    # parallelism (kernel sorts within group before any float math)
    tier = rollup(events, ["event_type"], "ts", "value", "1h")
    filled_1 = model_gapfill(tier.repartition(1), ["event_type"], "bucket", ["avg_value"],
                             lags=(1, 2, -1, -2), min_samples_train=20)
    filled_n = model_gapfill(tier.repartition(16), ["event_type"], "bucket", ["avg_value"],
                             lags=(1, 2, -1, -2), min_samples_train=20)
    fa = {(r.event_type, r.bucket): r.avg_value for r in filled_1.collect()}
    fb = {(r.event_type, r.bucket): r.avg_value for r in filled_n.collect()}
    assert fa == fb  # exact float equality, not approximate
