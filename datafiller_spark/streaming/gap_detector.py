"""Stateful streaming gap detector (applyInPandasWithState).

Custom stateful operator over the live 1m point stream: per series key
it remembers the last bucket seen and, whenever a new batch arrives,
emits one alert row per *missed* bucket between the remembered high
water and the batch's buckets — the streaming complement to the batch
gap-fill (alerts say "these buckets will need filling at rollup time").

State = (last_seen_epoch_minutes,) per key, updated monotonically, so
state size is O(keys) regardless of stream length. Engine-new surface
(the reference is batch-only — SURVEY §2.4 streaming).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType([StructField("last_minute", LongType())])

ALERT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("gap_start", TimestampType()),
        StructField("gap_minutes", IntegerType()),
    ]
)


def detect_gaps(
    stream: DataFrame,
    key_col: str = "source",
    ts_col: str = "event_ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming DataFrame of (source, gap_start, gap_minutes) alerts."""

    def track(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        minutes = set()
        for pdf in pdfs:
            minutes.update((pdf[ts_col].astype("int64") // (60 * 10**9)).tolist())
        if not minutes:
            yield pd.DataFrame(columns=["source", "gap_start", "gap_minutes"])
            return
        lo, hi = min(minutes), max(minutes)
        if state.exists:
            (last,) = state.get
            start = last + 1
        else:
            start = lo
        gaps = []
        run_start, run_len = None, 0
        for m in range(start, hi + 1):
            if m in minutes:
                if run_len:
                    gaps.append((run_start, run_len))
                run_start, run_len = None, 0
            else:
                if not run_len:
                    run_start = m
                run_len += 1
        if run_len:
            gaps.append((run_start, run_len))
        state.update((max(hi, start - 1),))
        yield pd.DataFrame(
            {
                "source": [key[0]] * len(gaps),
                "gap_start": [pd.Timestamp(m * 60, unit="s") for m, _ in gaps],
                "gap_minutes": [n for _, n in gaps],
            }
        )

    prepared = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        track,
        outputStructType=ALERT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
