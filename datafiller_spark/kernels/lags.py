"""Lag-feature assembly and small-gap interpolation.

Vectorized NumPy re-expression of the reference kernels:

- ``build_lag_matrix``       ⇔ reference src/datafiller/timeseries/_utils.py:8-48
  (Numba row-parallel loop → NumPy block slicing; identical layout:
  ``[X | X shifted by each lag | calendar]``, out-of-range cells NaN,
  positive lag = shift back in time, negative = lead).
- ``all_nan_columns``        ⇔ reference multivariate/_numba_utils.py:170-189.
- ``interpolate_small_gaps`` ⇔ reference timeseries/_utils.py:51-67
  (linear interpolation applied only to NaN runs of length ≤ n; longer
  runs untouched; leading NaNs stay NaN, trailing short runs take the
  last observed value — pandas ``interpolate`` forward semantics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..exceptions import EngineTypeError


def build_lag_matrix(
    values: np.ndarray, lags: np.ndarray, time_features: np.ndarray
) -> np.ndarray:
    """Assemble ``[X, X.shift(lag) per lag, calendar]`` in one allocation."""
    n_rows, n_series = values.shape
    lags = np.asarray(lags, dtype=np.int64)
    n_lags = len(lags)
    n_time = time_features.shape[1]
    out = np.empty((n_rows, n_series * (1 + n_lags) + n_time), dtype=values.dtype)
    out[:, :n_series] = values
    for t, lag in enumerate(lags):
        block = out[:, n_series * (t + 1) : n_series * (t + 2)]
        lag = int(lag)
        if lag >= 0:
            block[:lag, :] = np.nan
            if lag < n_rows:
                block[lag:, :] = values[: n_rows - lag]
        else:
            lead = -lag
            block[n_rows - lead :, :] = np.nan
            if lead < n_rows:
                block[: n_rows - lead, :] = values[lead:]
            # lead >= n_rows leaves the whole block NaN via the line above
            if lead >= n_rows:
                block[:, :] = np.nan
    out[:, n_series * (1 + n_lags) :] = time_features
    return out


def all_nan_columns(matrix: np.ndarray) -> np.ndarray:
    """Boolean mask of columns with no observed value at all."""
    return np.isnan(matrix).all(axis=0)


def interpolate_small_gaps(series: pd.Series, n: int) -> pd.Series:
    """Linearly interpolate NaN runs of length ≤ ``n``; leave longer runs.

    Run detection labels maximal stretches of equal null-ness; a stretch's
    size gates whether its interpolated values are kept.
    """
    if not isinstance(n, int):
        raise EngineTypeError("n must be an int")
    missing = series.isna()
    run_id = (missing != missing.shift()).cumsum()
    short_run = series.groupby(run_id).transform("size") <= n
    return series.interpolate().where(short_run, series)
