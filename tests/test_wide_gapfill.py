"""Cluster-distributed wide-panel imputation == the local kernel,
bit for bit (columns are independent, so chunked imputation over a
broadcast frame composes exactly)."""

import numpy as np
import pandas as pd

from datafiller_spark.kernels import TimeSeriesImputer
from datafiller_spark.operators import wide_gapfill
from datafiller_spark.sources import apply_mask, make_mar_mask


def _panel(n=300, k=12, seed=4):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, 1))
    data = base @ rng.normal(size=(1, k)) + 0.1 * rng.normal(size=(n, k))
    idx = pd.date_range("2024-03-01", periods=n, freq="5min")
    truth = pd.DataFrame(data, index=idx, columns=[f"s{i}" for i in range(k)])
    return apply_mask(truth, make_mar_mask(truth.shape, 0.15, np.random.default_rng(1)))


def test_wide_gapfill_equals_local_kernel_bit_exact(spark):
    holed = _panel()
    local = TimeSeriesImputer(
        lags=(1, 2, -1, -2), min_samples_train=10, interpolate_gaps_less_than=3
    )(holed, n_nearest_features=8)
    distributed = wide_gapfill(
        spark,
        holed,
        lags=(1, 2, -1, -2),
        min_samples_train=10,
        interpolate_gaps_less_than=3,
        n_nearest_features=8,
        columns_per_task=5,  # uneven chunking on purpose
    )
    assert list(distributed.columns) == list(local.columns)
    np.testing.assert_array_equal(local.to_numpy(), distributed.to_numpy())
    assert distributed.isna().sum().sum() == 0
