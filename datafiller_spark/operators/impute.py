"""Model-based gap-fill: the reference imputation kernel under Spark.

``model_gapfill`` runs the full TimeSeriesImputer recipe (grid
regularization → small-gap linear interpolation → lag/calendar ridge
imputation → mean fallback) per series group via ``applyInPandas`` —
one Arrow batch per key group, NumPy math inside, no per-row Python.

Determinism at scale: rows are sorted by bucket *inside* the kernel, so
the result is independent of Spark partitioning and Arrow batch order;
all order-sensitive float math happens on that sorted frame. This is
the property that keeps tiers reproducible when the same job runs at N
and 4N executors.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..kernels.timeseries import TimeSeriesImputer


def model_gapfill(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_cols: Sequence[str],
    lags: Sequence[int] = (1, 2, 3, -1, -2, -3),
    min_samples_train: int = 20,
    interpolate_gaps_less_than: int | None = None,
    n_nearest_features: int | float | None = None,
    add_time_features: bool = True,
) -> DataFrame:
    """Gap-fill ``value_cols`` per key group with the ridge kernel.

    Input rows may be sparse (missing buckets) — the kernel reinserts
    the full regular grid, so the output generally has MORE rows than
    the input: one per grid bucket. Output schema: key cols + bucket +
    value cols (double).
    """
    keys = list(key_cols)
    values = list(value_cols)

    out_schema = StructType()
    for k in keys:
        out_schema.add(df.schema[k])
    out_schema.add(df.schema[bucket_col])
    for v in values:
        out_schema.add(v, "double")

    lags_list = [int(x) for x in lags]

    def fill_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key_values = {k: pdf[k].iloc[0] for k in keys}
        frame = (
            pdf[[bucket_col] + values]
            .sort_values(bucket_col)
            .set_index(bucket_col)
            .astype("float64")
        )
        imputer = TimeSeriesImputer(
            lags=lags_list,
            min_samples_train=min_samples_train,
            interpolate_gaps_less_than=interpolate_gaps_less_than,
            add_time_features=add_time_features,
        )
        try:
            filled = imputer(frame, n_nearest_features=n_nearest_features)
        except Exception:
            # A group too short for frequency inference (or a single row)
            # passes through unfilled rather than failing the stage.
            filled = frame
        out = filled.reset_index().rename(columns={"index": bucket_col})
        for k, v in key_values.items():
            out[k] = v
        return out[[*keys, bucket_col, *values]]

    return df.select(*keys, bucket_col, *values).groupBy(*keys).applyInPandas(
        fill_group, schema=out_schema
    )
