"""Mixed-dtype DataFrame round-trip (M19) + sklearn-style surface.

Mirrors the reference's schema-preservation semantics
(reference tests/test_multivariate_polars.py:19-26, pandas form): the
imputed frame keeps column order, dtypes (bool → pandas boolean,
Categorical with category order, ints rounded back), and observed cells.
"""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.kernels import MultivariateImputer, TimeSeriesImputer
from datafiller_spark.kernels.frame import encode_dataframe


def _mixed_frame(n=120, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=n).cumsum()
    frame = pd.DataFrame(
        {
            "f": x,
            "i": (x * 10).round().astype("int64"),
            "b": x > 0,
            "c": pd.Categorical(
                np.where(x > 0, "hi", "lo"), categories=["lo", "hi"], ordered=True
            ),
            "s": pd.Series(np.where(x > 0.5, "big", "small"), dtype="string"),
        }
    )
    nan_rows = rng.choice(n, size=n // 8, replace=False)
    frame.loc[nan_rows[: n // 16], "f"] = np.nan
    frame.loc[nan_rows[n // 16 :], "c"] = np.nan
    frame.loc[nan_rows[:5], "s"] = pd.NA
    return frame


def test_encode_layout_and_nan_masking():
    df = _mixed_frame()
    codec = encode_dataframe(df)
    assert codec.matrix.dtype == np.float32
    # one code column per original + dummies for each categorical-ish col
    assert len(codec.main_indices) == 5
    assert set(codec.categories) == {
        int(codec.main_indices[2]),  # b
        int(codec.main_indices[3]),  # c
        int(codec.main_indices[4]),  # s
    }
    # dummy columns of 'c' are NaN exactly where 'c' is missing
    c_main = int(codec.main_indices[3])
    dummy_cols = [i for i, nm in enumerate(codec.feature_names) if nm.startswith("c_")]
    assert dummy_cols
    missing = df["c"].isna().to_numpy()
    for d in dummy_cols:
        assert np.array_equal(np.isnan(codec.matrix[:, d]), missing)
    # code column NaN where missing too
    assert np.array_equal(np.isnan(codec.matrix[:, c_main]), missing)


def test_mixed_frame_roundtrip_schema_and_values():
    df = _mixed_frame()
    out = MultivariateImputer(min_samples_train=10)(df)
    # schema preserved
    assert list(out.columns) == list(df.columns)
    assert out["i"].dtype == df["i"].dtype
    assert str(out["b"].dtype) == "boolean"
    assert isinstance(out["c"].dtype, pd.CategoricalDtype)
    assert list(out["c"].cat.categories) == ["lo", "hi"]
    assert out["c"].cat.ordered
    assert str(out["s"].dtype) == "string"
    # observed cells pass through unchanged
    for col in df.columns:
        obs = df[col].notna()
        assert (out.loc[obs, col] == df.loc[obs, col]).all(), col
    # fewer NaNs out than in; categorical fills are valid labels
    assert out.isna().sum().sum() < df.isna().sum().sum()
    assert out["c"].dropna().isin(["lo", "hi"]).all()


def test_categorical_fill_tracks_signal():
    # 'c' is a deterministic function of 'f' → ridge-on-codes should
    # recover it far better than the mode would
    df = _mixed_frame(n=240, seed=5)
    truth = np.where(df["f"].fillna(0) > 0, "hi", "lo")
    out = MultivariateImputer(min_samples_train=10)(df)
    filled_mask = df["c"].isna() & out["c"].notna() & df["f"].notna()
    if filled_mask.sum() >= 5:
        acc = (out.loc[filled_mask, "c"].astype(str) == truth[filled_mask]).mean()
        assert acc >= 0.8


def test_cols_to_impute_by_name():
    df = _mixed_frame()
    out = MultivariateImputer(min_samples_train=10)(df, cols_to_impute=["f"])
    assert out["f"].isna().sum() == 0
    assert out["c"].isna().sum() == df["c"].isna().sum()  # untargeted


def test_sklearn_surface_fit_transform_set_params():
    df = _mixed_frame()
    imp = MultivariateImputer(min_samples_train=10)
    a = imp.fit(df).transform(df)
    b = MultivariateImputer(min_samples_train=10)(df)
    pd.testing.assert_frame_equal(a, b)

    imp.set_params(min_samples_train=25, fallback=None)
    assert imp.min_samples_train == 25 and imp.fallback is None
    with pytest.raises(Exception):
        imp.set_params(bogus=1)

    tsi = TimeSeriesImputer(lags=(1, -1), min_samples_train=5)
    idx = pd.date_range("2024-01-01", periods=40, freq="h")
    frame = pd.DataFrame({"v": np.sin(np.arange(40) / 3.0)}, index=idx)
    frame.iloc[10:12, 0] = np.nan
    pd.testing.assert_frame_equal(tsi.fit(frame).transform(frame), tsi(frame))
    tsi.set_params(lags=(1, 2), interpolate_gaps_less_than=3)
    assert tsi.lags == [1, 2]
    assert tsi.multivariate_imputer.min_samples_train == 5  # carried through


def _mixed_ts_frame(n=200):
    """Reference tests/test_timeseries.py:95-112 fixture shape."""
    rng = np.random.default_rng(0)
    index = pd.date_range("2020-01-01", periods=n, freq="h")
    values = np.sin(2 * np.pi * np.arange(n) / 24) + 0.05 * rng.normal(size=n)
    labels = np.where(values > 0, "high", "low")
    df = pd.DataFrame(
        {
            "value": values,
            "level": pd.Categorical(labels, categories=["low", "high"]),
        },
        index=index,
    )
    df.loc[index[10:14], "value"] = np.nan
    df.loc[index[50:60], "level"] = np.nan
    df.loc[index[100], ["value", "level"]] = np.nan
    return df


def test_tsi_mixed_categorical_columns():
    df = _mixed_ts_frame()
    out = TimeSeriesImputer(lags=[1, 2, -1, -2])(df)
    assert list(out.columns) == ["value", "level"]
    assert out.shape == df.shape
    assert isinstance(out["level"].dtype, pd.CategoricalDtype)
    assert list(out["level"].cat.categories) == ["low", "high"]
    assert not out.isna().any().any()
    # predictions track the signal, not just the mode (reference bound)
    filled = out.loc[df.index[50:60], "level"]
    expected = np.where(out.loc[df.index[50:60], "value"] > 0, "high", "low")
    assert (filled.to_numpy().astype(str) == expected).mean() >= 0.8
    # observed cells pass through bit-exactly
    obs = df["value"].notna()
    assert (out.loc[obs, "value"] == df.loc[obs, "value"]).all()


def test_tsi_mixed_bool_and_object_columns():
    df = _mixed_ts_frame()
    df["flag"] = df["value"].fillna(0) > 0.2
    df["tag"] = np.where(df["value"].fillna(0) > 0, "pos", "neg")
    df.loc[df.index[30:35], "tag"] = None
    out = TimeSeriesImputer(lags=[1, -1])(df)
    assert str(out["flag"].dtype) == "boolean"
    assert out["tag"].isna().sum() == 0


def test_tsi_mixed_name_collision_raises():
    from datafiller_spark.exceptions import EngineValueError

    df = _mixed_ts_frame()
    df["value_lag_1"] = pd.Categorical(["low"] * len(df), categories=["low", "high"])
    with pytest.raises(EngineValueError):
        TimeSeriesImputer(lags=[1])(df)


def test_tsi_mixed_targeting_and_interp():
    df = _mixed_ts_frame()
    out = TimeSeriesImputer(lags=[1, -1], interpolate_gaps_less_than=6)(
        df, cols_to_impute=["value"]
    )
    assert out["value"].isna().sum() == 0
    assert out["level"].isna().sum() == df["level"].isna().sum()  # untargeted
