"""Spark-native gap fills vs their pandas/kernel oracles."""

import datetime

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.kernels import interpolate_small_gaps
from datafiller_spark.operators import (
    backward_fill,
    fill_small_gaps,
    forward_fill,
    linear_fill,
)


@pytest.fixture(scope="module")
def gridded(spark):
    base = datetime.datetime(2024, 1, 1)
    vals = [1.0, None, None, 4.0, None, 6.0, None, None, None, None, 11.0, None]
    rows = [
        (key, base + datetime.timedelta(minutes=i), v)
        for key in ("k1", "k2")
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, ["key", "bucket", "value"]), vals


def _col(df, key="k1"):
    return [r.out for r in df.where(df.key == key).orderBy("bucket").select(df.out.alias("out")).collect()]


def test_forward_fill(gridded):
    df, vals = gridded
    out = forward_fill(df, ["key"], "bucket", "value", "out")
    got = [r.out for r in out.where("key='k1'").orderBy("bucket").collect()]
    expected = pd.Series(vals, dtype="float64").ffill().tolist()
    assert got == pytest.approx(expected, nan_ok=True)


def test_backward_fill(gridded):
    df, vals = gridded
    out = backward_fill(df, ["key"], "bucket", "value", "out")
    got = [r.out for r in out.where("key='k1'").orderBy("bucket").collect()]
    expected = pd.Series(vals, dtype="float64").bfill()
    assert got[:-1] == pytest.approx(expected[:-1].tolist())
    assert got[-1] is None  # no right anchor


def test_linear_fill_matches_pandas_interpolate(gridded):
    df, vals = gridded
    out = linear_fill(df, ["key"], "bucket", "value", "out")
    got = [r.out for r in out.where("key='k1'").orderBy("bucket").collect()]
    expected = pd.Series(vals, dtype="float64").interpolate().tolist()
    assert got == pytest.approx(expected)


def test_fill_small_gaps_matches_kernel(gridded):
    df, vals = gridded
    for max_gap in (1, 2, 3, 4):
        out = fill_small_gaps(df, ["key"], "bucket", "value", max_gap, "out")
        got = [r.out for r in out.where("key='k1'").orderBy("bucket").collect()]
        expected = interpolate_small_gaps(pd.Series(vals, dtype="float64"), max_gap)
        for g, e in zip(got, expected):
            if pd.isna(e):
                assert g is None
            else:
                assert g == pytest.approx(e)


def test_fills_are_per_key(gridded):
    df, _ = gridded
    out = forward_fill(df, ["key"], "bucket", "value", "out")
    k1 = [r.out for r in out.where("key='k1'").orderBy("bucket").collect()]
    k2 = [r.out for r in out.where("key='k2'").orderBy("bucket").collect()]
    assert k1 == k2  # same inputs → same fills, no cross-key leakage


def test_leading_gap_stays_null(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = [("k", base + datetime.timedelta(minutes=i), v) for i, v in enumerate([None, None, 3.0])]
    df = spark.createDataFrame(rows, ["key", "bucket", "value"])
    out = linear_fill(df, ["key"], "bucket", "value", "out")
    got = [r.out for r in out.orderBy("bucket").collect()]
    assert got[0] is None and got[1] is None and got[2] == 3.0
