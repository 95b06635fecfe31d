"""Lag matrix and small-gap interpolation tests.

Reference analogues: tests/test_timeseries.py:233-246 (lag matrix equals
concatenated ``df.shift(lag)``), timeseries/_utils.py:51-67 semantics.
"""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.exceptions import EngineTypeError
from datafiller_spark.kernels import build_lag_matrix, interpolate_small_gaps, all_nan_columns


def test_lag_matrix_equals_pandas_shift():
    rng = np.random.default_rng(0)
    df = pd.DataFrame(rng.normal(size=(40, 3)), columns=list("abc"))
    lags = [1, 2, -1, -3]
    got = build_lag_matrix(df.to_numpy(), np.array(lags), np.empty((40, 0)))
    expected = pd.concat([df] + [df.shift(lag) for lag in lags], axis=1).to_numpy()
    np.testing.assert_array_equal(got, expected)


def test_lag_matrix_appends_time_features():
    values = np.arange(12, dtype=np.float64).reshape(6, 2)
    tf = np.full((6, 2), 7.0)
    got = build_lag_matrix(values, np.array([1]), tf)
    assert got.shape == (6, 2 * 2 + 2)
    np.testing.assert_array_equal(got[:, -2:], tf)
    np.testing.assert_array_equal(got[:, :2], values)
    assert np.isnan(got[0, 2:4]).all()
    np.testing.assert_array_equal(got[1:, 2:4], values[:-1])


def test_lag_larger_than_series_is_all_nan():
    values = np.ones((3, 1))
    got = build_lag_matrix(values, np.array([5, -5]), np.empty((3, 0)))
    assert np.isnan(got[:, 1]).all()
    assert np.isnan(got[:, 2]).all()


def test_small_gap_interpolation_only_short_runs():
    s = pd.Series([1.0, np.nan, 3.0, np.nan, np.nan, np.nan, 7.0, 8.0])
    out = interpolate_small_gaps(s, 2)
    assert out[1] == 2.0  # run of 1 ≤ 2 → interpolated
    assert out[3:6].isna().all()  # run of 3 > 2 → untouched
    np.testing.assert_array_equal(out[[0, 2, 6, 7]], s[[0, 2, 6, 7]])


def test_small_gap_edges_match_pandas_interpolate():
    s = pd.Series([np.nan, 1.0, np.nan, 3.0, np.nan])
    out = interpolate_small_gaps(s, 1)
    assert np.isnan(out[0])  # leading NaN: no left anchor
    assert out[2] == 2.0
    assert out[4] == 3.0  # trailing short run: forward-filled by interpolate


def test_small_gap_requires_int():
    with pytest.raises(EngineTypeError):
        interpolate_small_gaps(pd.Series([1.0, np.nan]), 1.5)


def test_all_nan_columns():
    m = np.array([[1.0, np.nan, np.nan], [2.0, np.nan, 3.0]])
    np.testing.assert_array_equal(all_nan_columns(m), [False, True, False])
