"""TimeSeriesImputer golden tests — reference fixtures recast.

Reference analogues: tests/test_timeseries.py:8-12 (nan_df), :55-73
(48h reindex panel, mean abs err < 0.2), frequency-inference error
paths (timeseries/imputer.py:187-213).
"""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.exceptions import EngineValueError
from datafiller_spark.kernels import TimeSeriesImputer, infer_frequency, regularize_index


@pytest.fixture
def nan_df():
    idx = pd.date_range("2021-01-01", periods=10, freq="D")
    return pd.DataFrame(
        {
            "a": [1.0, 2, np.nan, 4, 5, 6, np.nan, 8, 9, 10],
            "b": [10.0, 9, 8, np.nan, 6, 5, 4, 3, np.nan, 1],
        },
        index=idx,
    )


def test_imputes_all_nans(nan_df):
    out = TimeSeriesImputer(lags=[1, -1], min_samples_train=4)(nan_df)
    assert out.isna().sum().sum() == 0
    assert list(out.columns) == list(nan_df.columns)
    assert out.index.equals(nan_df.index)


def test_observed_values_unchanged(nan_df):
    out = TimeSeriesImputer(lags=[1, -1], min_samples_train=4)(nan_df)
    observed = nan_df.notna()
    np.testing.assert_array_equal(out.values[observed.values], nan_df.values[observed.values])


def test_sine_panel_gap_recovery():
    # 48h hourly sine + trend panel with a 6-row missing block: model-based
    # fill must track the signal (reference bound: mean abs err < 0.2).
    idx = pd.date_range("2022-01-01", periods=48, freq="h")
    t = np.arange(48)
    truth = pd.DataFrame(
        {
            "s1": np.sin(2 * np.pi * t / 24) + 0.01 * t,
            "s2": np.cos(2 * np.pi * t / 24) + 0.02 * t,
        },
        index=idx,
    )
    holed = truth.drop(truth.index[20:26])  # missing timestamps, not NaNs
    out = TimeSeriesImputer(lags=[1, 2, 3, -1, -2, -3], min_samples_train=10)(holed)
    assert len(out) == 48
    err = np.abs(out.iloc[20:26] - truth.iloc[20:26]).mean().mean()
    assert err < 0.2


def test_regularize_inserts_missing_timestamps():
    idx = pd.date_range("2021-01-01", periods=6, freq="h")
    df = pd.DataFrame({"v": np.arange(6.0)}, index=idx)
    holed = df.drop(df.index[[2, 3]])
    full = regularize_index(holed)
    assert len(full) == 6
    assert full["v"].isna().sum() == 2


def test_infer_frequency_from_regular_gaps():
    idx = pd.DatetimeIndex(
        ["2021-01-01 00:00", "2021-01-01 00:05", "2021-01-01 00:20", "2021-01-01 00:30"]
    )
    assert infer_frequency(idx) == pd.Timedelta(minutes=5)


def test_irregular_gaps_raise():
    idx = pd.DatetimeIndex(
        ["2021-01-01 00:00", "2021-01-01 00:05", "2021-01-01 00:12", "2021-01-01 00:30"]
    )
    with pytest.raises(EngineValueError):
        infer_frequency(idx)


def test_unsorted_index_raises():
    idx = pd.DatetimeIndex(["2021-01-02", "2021-01-01", "2021-01-05", "2021-01-11"])
    with pytest.raises(EngineValueError):
        infer_frequency(idx)


def test_lag_validation():
    with pytest.raises(EngineValueError):
        TimeSeriesImputer(lags=[0])
    with pytest.raises(EngineValueError):
        TimeSeriesImputer(lags=[1.5])


def test_small_gap_preinterpolation():
    idx = pd.date_range("2021-01-01", periods=8, freq="D")
    df = pd.DataFrame({"v": [1.0, np.nan, 3, 4, 5, 6, 7, 8]}, index=idx)
    out = TimeSeriesImputer(lags=[1], interpolate_gaps_less_than=2, min_samples_train=3)(df)
    assert out.loc[idx[1], "v"] == 2.0  # linear, not model-based


def test_before_after_targeting():
    idx = pd.date_range("2021-01-01", periods=12, freq="D")
    df = pd.DataFrame({"v": np.arange(12.0), "w": np.arange(12.0) * 2}, index=idx)
    df.loc[idx[2], "v"] = np.nan
    df.loc[idx[9], "v"] = np.nan
    out = TimeSeriesImputer(lags=[1, -1], min_samples_train=4)(df, before="2021-01-06")
    assert not np.isnan(out.loc[idx[2], "v"])
    assert np.isnan(out.loc[idx[9], "v"])
