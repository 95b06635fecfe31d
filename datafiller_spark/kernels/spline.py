"""Natural cubic-spline gap interpolation (engine extra, no scipy).

The north-star gap-fill menu names linear AND spline interpolation; the
reference implements only linear small-gap fills
(reference src/datafiller/timeseries/_utils.py:51-67), so the spline is
an engine extra validated by round-trip/behavioral properties rather
than oracle parity (SURVEY §7 "hard parts").

Classic natural cubic spline: second derivatives M solved from the
tridiagonal system (Thomas algorithm — O(n), the n×n dense solve would
be O(n³)) with M=0 at both ends, then piecewise-cubic evaluation at the
missing grid points. Only interior gaps are filled (no extrapolation
past the first/last observation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def natural_cubic_eval(
    x_obs: np.ndarray, y_obs: np.ndarray, x_new: np.ndarray
) -> np.ndarray:
    """Evaluate the natural cubic spline through (x_obs, y_obs) at x_new.

    ``x_obs`` must be strictly increasing with at least 2 points;
    ``x_new`` must lie within [x_obs[0], x_obs[-1]].
    """
    x = np.asarray(x_obs, dtype=np.float64)
    y = np.asarray(y_obs, dtype=np.float64)
    n = len(x)
    if n == 2:
        # natural spline of two points is the straight line
        t = (x_new - x[0]) / (x[1] - x[0])
        return y[0] + t * (y[1] - y[0])

    h = np.diff(x)
    rhs = 6.0 * np.diff(np.diff(y) / h)
    # Thomas algorithm on the (n-2)-row tridiagonal system; natural
    # boundary: M[0] = M[n-1] = 0
    diag = 2.0 * (h[:-1] + h[1:])
    lower = h[1:-1].copy()
    upper = h[1:-1].copy()
    m = n - 2
    cp = np.empty(m)
    dp = np.empty(m)
    cp[0] = upper[0] / diag[0] if m > 1 else 0.0
    dp[0] = rhs[0] / diag[0]
    for i in range(1, m):
        denom = diag[i] - lower[i - 1] * cp[i - 1]
        cp[i] = upper[i] / denom if i < m - 1 else 0.0
        dp[i] = (rhs[i] - lower[i - 1] * dp[i - 1]) / denom
    M = np.zeros(n)
    M[m] = dp[m - 1]
    for i in range(m - 2, -1, -1):
        M[i + 1] = dp[i] - cp[i] * M[i + 2]

    # piecewise evaluation (vectorized over x_new)
    seg = np.clip(np.searchsorted(x, x_new, side="right") - 1, 0, n - 2)
    hx = h[seg]
    a = (x[seg + 1] - x_new) / hx
    b = (x_new - x[seg]) / hx
    return (
        a * y[seg]
        + b * y[seg + 1]
        + ((a**3 - a) * M[seg] + (b**3 - b) * M[seg + 1]) * (hx**2) / 6.0
    )


def spline_interpolate(series: pd.Series, max_gap: int | None = None) -> pd.Series:
    """Fill interior NaN runs of a (grid-indexed) series with the natural
    cubic spline through the observed points.

    ``max_gap`` limits filling to NaN runs of at most that length,
    mirroring the linear ``interpolate_small_gaps`` contract; None fills
    every interior gap. Leading/trailing NaNs are never filled.
    """
    values = series.to_numpy(dtype=np.float64)
    isna = np.isnan(values)
    obs = np.flatnonzero(~isna)
    if len(obs) < 2 or not isna.any():
        return series.copy()
    targets = np.flatnonzero(isna)
    targets = targets[(targets > obs[0]) & (targets < obs[-1])]
    if max_gap is not None and len(targets):
        run_id = np.cumsum(np.diff(np.concatenate(([0], isna.view(np.int8)))) == 1)[isna]
        run_len = np.bincount(run_id)
        all_nan = np.flatnonzero(isna)
        keep = np.isin(targets, all_nan[run_len[run_id] <= max_gap])
        targets = targets[keep]
    if not len(targets):
        return series.copy()
    out = values.copy()
    out[targets] = natural_cubic_eval(
        obs.astype(np.float64), values[obs], targets.astype(np.float64)
    )
    return pd.Series(out, index=series.index, name=series.name)
