"""Parity of the engine's imputation kernels against the REAL reference.

The reference library itself runs in-process via tests/_reference_oracle
(numba shimmed to pure Python — every @njit function is valid Python, so
the shim changes speed, not values). Two parity levels, both pinned:

1. **Bit-exact vs the reference's materialized-refit path.** With both
   sides forced down the materialized branch (engine: ``use_gram=False``;
   reference: any regressor whose ``type`` is not exactly ``FastRidge``
   — reference multivariate/imputer.py:523) every fit input, every
   prediction, and every output cell is identical at the byte level.
   Asserted with ``assert_array_equal``.

2. **Tolerance vs the reference's DEFAULT Gram fast path.** The
   reference pins its own two paths equal only within rtol≈1e-4
   (reference tests/test_multivariate.py:375-388): the Gram path
   accumulates float32 gathers into float64 Grams in a different
   floating-point order. We assert the reference's own cross-path bound.

Fixtures mirror SURVEY §5 / reference tests/test_timeseries.py:8-12 (the
10×2 daily frame), :55-73 (48 h reindex panel), :95-112 (200-row hourly
panel, numeric variant), and seeded MAR matrices.
"""

import numpy as np
import pandas as pd
import pytest

from datafiller_spark.kernels import MultivariateImputer as EngineMVI
from datafiller_spark.kernels import TimeSeriesImputer as EngineTSI

from _reference_oracle import load_reference


@pytest.fixture(scope="module")
def reference():
    try:
        return load_reference()
    except Exception as exc:  # noqa: BLE001 - reference missing → skip, not fail
        pytest.skip(f"reference datafiller not importable: {exc}")


@pytest.fixture(scope="module")
def materialized_ridge(reference):
    """A FastRidge whose *type* differs, forcing the reference down the
    materialized-refit path — the branch the engine implements."""

    class MaterializedRidge(reference.FastRidge):
        pass

    return MaterializedRidge


# -- fixtures (SURVEY §5) ----------------------------------------------------

def _nan_df():
    rng = pd.date_range("2020-01-01", periods=10, freq="D")
    return pd.DataFrame(
        {
            "value": [1, 2, np.nan, 4, 5, 6, np.nan, 8, 9, 10],
            "value2": [1, 2, 3, 4, 5, 6, 7, 8, np.nan, 10],
        },
        index=rng,
        dtype="float64",
    )


def _reindex_panel():
    full_index = pd.date_range("2024-01-01", periods=48, freq="h")
    t = np.arange(len(full_index), dtype=np.float32)
    df = pd.DataFrame(
        {
            "load": 0.2 * t + np.sin(2 * np.pi * t / 24),
            "temperature": 10 + np.cos(2 * np.pi * t / 24),
        },
        index=full_index,
    )
    return df.drop(index=full_index[18:24]), full_index


def _hourly_panel():
    rng = np.random.default_rng(0)
    index = pd.date_range("2020-01-01", periods=200, freq="h")
    values = np.sin(2 * np.pi * np.arange(len(index)) / 24) + 0.05 * rng.normal(size=len(index))
    df = pd.DataFrame({"value": values, "value_b": np.roll(values, 3)}, index=index)
    df.loc[index[10:14], "value"] = np.nan
    df.loc[index[100], ["value", "value_b"]] = np.nan
    df.loc[index[50:60], "value_b"] = np.nan
    return df


def _mar_matrix(seed=0, shape=(200, 6), ratio=0.1):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=shape)
    x = base @ rng.normal(size=(shape[1], shape[1])) * 0.5 + base
    mask = rng.random(shape) < ratio
    x_nan = x.copy()
    x_nan[mask] = np.nan
    return x_nan


# -- bit-exact parity: engine == reference materialized path ------------------

def test_mvi_bit_exact_vs_reference_materialized(reference, materialized_ridge):
    for seed, ratio in ((0, 0.1), (1, 0.3), (2, 0.05)):
        x = _mar_matrix(seed=seed, ratio=ratio)
        r = reference.MultivariateImputer(regressor=materialized_ridge())(x.copy())
        e = EngineMVI(use_gram=False)(x.copy())
        np.testing.assert_array_equal(e, r)


def test_mvi_bit_exact_with_feature_selection(reference, materialized_ridge):
    x = _mar_matrix(seed=3)
    r = reference.MultivariateImputer(regressor=materialized_ridge())(
        x.copy(), n_nearest_features=3
    )
    e = EngineMVI(use_gram=False)(x.copy(), n_nearest_features=3)
    np.testing.assert_array_equal(e, r)


def test_mvi_bit_exact_with_targeting(reference, materialized_ridge):
    x = _mar_matrix(seed=4)
    rows = list(range(0, 150))
    cols = [0, 2, 5]
    r = reference.MultivariateImputer(regressor=materialized_ridge())(
        x.copy(), rows_to_impute=rows, cols_to_impute=cols
    )
    e = EngineMVI(use_gram=False)(x.copy(), rows_to_impute=rows, cols_to_impute=cols)
    np.testing.assert_array_equal(e, r)


def test_tsi_bit_exact_nan_df(reference, materialized_ridge):
    df = _nan_df()
    r = reference.TimeSeriesImputer(regressor=materialized_ridge())(df)
    e = EngineTSI(use_gram=False)(df)
    np.testing.assert_array_equal(e.to_numpy(), r.to_numpy())
    assert list(e.columns) == list(r.columns)
    assert e.index.equals(r.index)


def test_tsi_bit_exact_reindex_panel(reference, materialized_ridge):
    dfm, full_index = _reindex_panel()
    r = reference.TimeSeriesImputer(lags=(1, 2, -1, -2), regressor=materialized_ridge())(dfm)
    e = EngineTSI(lags=(1, 2, -1, -2), use_gram=False)(dfm)
    assert e.index.equals(full_index) and r.index.equals(full_index)
    np.testing.assert_array_equal(e.to_numpy(), r.to_numpy())


def test_tsi_bit_exact_hourly_panel_with_interp(reference, materialized_ridge):
    df = _hourly_panel()
    kwargs = dict(lags=(1, 2, 3, -1, -2, -3), interpolate_gaps_less_than=3)
    r = reference.TimeSeriesImputer(regressor=materialized_ridge(), **kwargs)(df)
    e = EngineTSI(use_gram=False, **kwargs)(df)
    np.testing.assert_array_equal(e.to_numpy(), r.to_numpy())


def test_tsi_bit_exact_before_after(reference, materialized_ridge):
    df = _nan_df()
    r = reference.TimeSeriesImputer(regressor=materialized_ridge())(df, before="2020-01-08")
    e = EngineTSI(use_gram=False)(df, before="2020-01-08")
    np.testing.assert_array_equal(e.to_numpy(), r.to_numpy())


def test_fallback_bit_exact(reference, materialized_ridge):
    # One column too sparse to train → column-mean fallback on both sides.
    rng = np.random.default_rng(7)
    x = rng.normal(size=(30, 3))
    x[5:25, 0] = np.nan  # only 10 observed rows < min_samples_train=20
    r = reference.MultivariateImputer(regressor=materialized_ridge())(x.copy())
    e = EngineMVI(use_gram=False)(x.copy())
    np.testing.assert_array_equal(e, r)


# -- tolerance parity: engine vs reference DEFAULT (Gram fast path) -----------

def _assert_cross_path_close(e: np.ndarray, r: np.ndarray) -> None:
    """The reference's own Gram-vs-materialized bound: small absolute
    error relative to each column's spread (reference
    tests/test_multivariate.py:483-501 uses 1e-4 of the column range)."""
    spread = np.nanmax(r, axis=0) - np.nanmin(r, axis=0)
    spread[spread == 0] = 1.0
    rel = np.abs(e - r) / spread
    assert np.nanmax(rel) < 1e-4, f"max rel-to-spread error {np.nanmax(rel):.2e}"


def test_mvi_close_to_reference_default_gram_path(reference):
    """Engine default (Gram fast path) vs reference default (Gram fast
    path): same algorithm, different accumulation order (BLAS batch vs
    row loops) → the reference's own cross-path bound applies."""
    for seed in (0, 1):
        x = _mar_matrix(seed=seed)
        r = reference.MultivariateImputer()(x.copy())
        e = EngineMVI()(x.copy())
        _assert_cross_path_close(e, r)


def test_tsi_close_to_reference_default_gram_path(reference):
    dfm, _ = _reindex_panel()
    r = reference.TimeSeriesImputer(lags=(1, 2, -1, -2))(dfm)
    e = EngineTSI(lags=(1, 2, -1, -2))(dfm)
    _assert_cross_path_close(e.to_numpy(), r.to_numpy())


# -- Spark-level parity: model_gapfill operator vs the reference --------------

def test_spark_model_gapfill_matches_reference(spark, reference, materialized_ridge):
    """The distributed operator (groupBy → applyInPandas kernel) must
    reproduce the reference imputer run per-series on the same frames —
    the driver query `model_gapfill_1h` is backed by this parity."""
    from datafiller_spark.operators import model_gapfill

    # two series, hourly grid with a contiguous hole + scattered NaNs
    idx = pd.date_range("2024-01-01", periods=96, freq="h")
    t = np.arange(96, dtype="float64")
    rows = []
    for key, phase in (("a", 0.0), ("b", 1.3)):
        vals = np.sin(2 * np.pi * (t + phase) / 24) + 0.1 * t
        keep = np.ones(96, dtype=bool)
        keep[30:36] = False  # dropped buckets → grid reinsertion
        for ts_, v, k in zip(idx, vals, keep):
            if k:
                rows.append((key, ts_.to_pydatetime(), float(v)))
    sdf = spark.createDataFrame(rows, "key string, bucket timestamp, avg_value double")

    out = model_gapfill(
        sdf, ["key"], "bucket", ["avg_value"], lags=(1, 2, -1, -2), min_samples_train=20,
        use_gram=False,
    ).toPandas()

    for key in ("a", "b"):
        got = (
            out[out["key"] == key]
            .set_index("bucket")[["avg_value"]]
            .sort_index()
            .astype("float64")
        )
        pdf = (
            pd.DataFrame(
                [(ts_, v) for k2, ts_, v in rows if k2 == key], columns=["bucket", "avg_value"]
            )
            .set_index("bucket")
            .sort_index()
            .astype("float64")
        )
        expected = reference.TimeSeriesImputer(
            lags=(1, 2, -1, -2), regressor=materialized_ridge(), min_samples_train=20
        )(pdf)
        np.testing.assert_array_equal(got.to_numpy(), expected.to_numpy())
