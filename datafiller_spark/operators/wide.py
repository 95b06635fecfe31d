"""Cluster-distributed wide-panel imputation.

The reference's published benchmark shape — ONE series, many sensor
columns (PEMS-BAY: 8064×60, production panels: 10^4-10^5 sensors) — is
the transpose of the engine's per-key gap-fill: there is a single time
index, and the parallelism axis is the TARGET COLUMN. Column
imputations are independent by construction (each reads the shared
matrix, writes only its own column — the same property the kernel's
``n_jobs`` pool exploits on one node), so the cluster form is:

    broadcast the panel → one Spark task per column chunk, each running
    ``TimeSeriesImputer(..., cols_to_impute=chunk)`` → driver stitches
    the imputed columns.

Every executor pays one lag-matrix build for its chunks (seconds) in
exchange for cluster-wide fan-out of the pattern/optimask/ridge work —
the right trade once columns × patterns dwarf it. Outputs are
bit-identical to the single-shot kernel (pinned by
tests/test_wide_gapfill.py): per-column results do not depend on which
other columns are being imputed in the same call.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import SparkSession


def wide_gapfill(
    spark: SparkSession,
    frame: pd.DataFrame,
    lags: Sequence[int] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int | None = None,
    interpolate_gaps_less_than: int | None = None,
    n_nearest_features: int | float | None = None,
    add_time_features: bool = True,
    columns_per_task: int = 8,
) -> pd.DataFrame:
    """Impute a wide single-series panel across the cluster.

    Args:
        frame: pandas DataFrame with a DatetimeIndex (the reference's
            TimeSeriesImputer input shape).
        columns_per_task: chunk size — small enough to fan out, large
            enough to amortize the per-task lag-matrix build.

    Returns the fully imputed frame, bit-identical to
    ``TimeSeriesImputer(...)(frame, n_nearest_features=...)`` run
    locally.
    """
    from ..kernels.timeseries import TimeSeriesImputer

    cols = list(frame.columns)
    chunks = [cols[i : i + columns_per_task] for i in range(0, len(cols), columns_per_task)]
    lags_list = [int(x) for x in lags]
    bc = spark.sparkContext.broadcast(frame)

    def impute_chunk(chunk: list) -> pd.DataFrame:
        imputer = TimeSeriesImputer(
            lags=lags_list,
            min_samples_train=min_samples_train,
            interpolate_gaps_less_than=interpolate_gaps_less_than,
            add_time_features=add_time_features,
        )
        filled = imputer(
            bc.value, cols_to_impute=list(chunk), n_nearest_features=n_nearest_features
        )
        return filled[list(chunk)]

    pieces = (
        spark.sparkContext.parallelize(chunks, numSlices=len(chunks))
        .map(impute_chunk)
        .collect()
    )
    out = pd.concat(pieces, axis=1)
    bc.unpersist()
    return out[cols]
