"""Deterministic calendar features for the imputation feature matrix.

Parity with reference src/datafiller/timeseries/imputer.py:225-256:
normalized linear trend over the observed span, sin/cos of the
hour-of-day angle (hour + minute/60 over 24h) and of the day-of-week
angle (0..6 over 7), all computed in float32 with float32 angle
constants so trig outputs match bit-for-bit. Name collisions against
reserved names get ``_1``, ``_2``… suffixes.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

TIME_FEATURE_BASENAMES = (
    "__time_trend",
    "__time_day_sin",
    "__time_day_cos",
    "__time_week_sin",
    "__time_week_cos",
)


def make_time_features(
    index: pd.DatetimeIndex, reserved_names: Iterable[str] = ()
) -> pd.DataFrame:
    # int64-nanosecond arithmetic instead of six DatetimeIndex accessor
    # calls (each allocates through pandas machinery — a fixed ~1 ms per
    # per-series kernel call). Values are bit-identical: hour/minute/
    # day-of-week are exact small integers either way, and the trend is
    # the same float64 division rounded once to float32.
    ns = index.asi8
    elapsed64 = (ns - ns[0]) / 86_400_000_000_000.0  # days, float64
    elapsed = elapsed64.astype(np.float32)
    if elapsed.size and elapsed[-1] != 0:
        trend = elapsed / elapsed[-1]
    else:
        trend = np.zeros(len(index), dtype=np.float32)

    day_s = ns // 1_000_000_000 % 86_400
    hour = (day_s // 3600).astype(np.float32) + (day_s // 60 % 60).astype(np.float32) / 60.0
    # 1970-01-01 is a Thursday: pandas dayofweek (Monday=0) == (days+3) % 7
    dow = ((ns // 86_400_000_000_000 + 3) % 7).astype(np.float32)
    day_angle = np.float32(2.0 * np.pi) * hour / np.float32(24.0)
    week_angle = np.float32(2.0 * np.pi) * dow / np.float32(7.0)

    raw = {
        TIME_FEATURE_BASENAMES[0]: trend.astype(np.float32, copy=False),
        TIME_FEATURE_BASENAMES[1]: np.sin(day_angle).astype(np.float32, copy=False),
        TIME_FEATURE_BASENAMES[2]: np.cos(day_angle).astype(np.float32, copy=False),
        TIME_FEATURE_BASENAMES[3]: np.sin(week_angle).astype(np.float32, copy=False),
        TIME_FEATURE_BASENAMES[4]: np.cos(week_angle).astype(np.float32, copy=False),
    }
    taken = set(reserved_names)
    out = {}
    for base, vals in raw.items():
        name = base
        k = 1
        while name in taken:
            name = f"{base}_{k}"
            k += 1
        taken.add(name)
        out[name] = vals
    return pd.DataFrame(out, index=index)
