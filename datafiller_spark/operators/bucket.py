"""Time bucketing and grid regularization, Spark-native.

``time_bucket`` truncates timestamps to tier boundaries — a pure
projection, stays inside whole-stage codegen and lets Catalyst push the
surrounding filters into the scan.

``regular_grid`` is the cluster-scale analogue of the reference's
``_regularize_index`` (reference: src/datafiller/timeseries/imputer.py:
215-223): for every series key it materializes the complete bucket
calendar between the key's first and last observation via
``sequence()`` + ``explode`` — executed per key on executors, no
driver-side loop — and left-joins the observed rows, so missing buckets
surface as NULL rows to gap-fill. The join keys equal the upstream
groupBy keys, so under AQE the exchange is reused rather than repeated.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRUNC_UNIT = {"1m": "minute", "1h": "hour", "1d": "day"}
_INTERVAL_SQL = {"1m": "interval 1 minute", "1h": "interval 1 hour", "1d": "interval 1 day"}


def time_bucket(ts: Column | str, tier: str) -> Column:
    """Truncate a timestamp column to the tier boundary (1m/1h/1d)."""
    if tier not in _TRUNC_UNIT:
        raise ValueError(f"unknown tier {tier!r}; expected one of {sorted(_TRUNC_UNIT)}")
    col = F.col(ts) if isinstance(ts, str) else ts
    return F.date_trunc(_TRUNC_UNIT[tier], col)


def bucket_interval(tier: str) -> str:
    if tier not in _INTERVAL_SQL:
        raise ValueError(f"unknown tier {tier!r}; expected one of {sorted(_INTERVAL_SQL)}")
    return _INTERVAL_SQL[tier]


def regular_grid(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    tier: str,
) -> DataFrame:
    """Left-join ``df`` onto each key's complete bucket calendar.

    Output has one row per (key, bucket on the regular grid); buckets
    absent from ``df`` carry NULLs in every non-key column.
    """
    interval = bucket_interval(tier)
    keys = list(key_cols)
    span = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("__first"), F.max(bucket_col).alias("__last")
    )
    calendar = span.select(
        *keys,
        F.explode(
            F.sequence(F.col("__first"), F.col("__last"), F.expr(interval))
        ).alias(bucket_col),
    )
    return calendar.join(df, on=keys + [bucket_col], how="left")
