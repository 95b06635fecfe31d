"""Structured Streaming front-end for the 1m tier.

The continuous-aggregate path for live ingest: tumbling-window
aggregation with a watermark for late data. The aggregate set is the
same composable (count, sum, min, max) as the batch rollup, so the
streaming 1m tier feeds the identical 1h/1d cascade and gap-fill stages
— late rows within the watermark update their window in place;
later-than-watermark rows are the snapshot re-rollup case handled by the
batch checkpoint path (plans/checkpoint.py).

The reference is batch-only (SURVEY §2.4); this is engine-new surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WINDOW = {"1m": "1 minute", "1h": "1 hour", "1d": "1 day"}


def streaming_rollup(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tier: str = "1m",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window tier aggregation over a streaming DataFrame."""
    keys = list(key_cols)
    # watermarks require TIMESTAMP (NTZ is rejected); session TZ is UTC so
    # the cast is value-preserving for the naive-UTC test tables
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, _WINDOW[tier]).alias("__win"))
        .agg(
            F.count(value_col).alias("n_points"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            *keys,
            F.col("__win.start").alias("bucket"),
            "n_points",
            "sum_value",
            "min_value",
            "max_value",
            (F.col("sum_value") / F.col("n_points")).alias("avg_value"),
        )
    )


def start_rollup_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    checkpoint_dir: str,
    output_path: str | None = None,
    query_name: str = "tier_1m_stream",
    tier: str = "1m",
    watermark: str = "10 minutes",
):
    """Start the streaming 1m rollup.

    With ``output_path``: append-mode parquet sink (finalized windows
    only — exactly the tier table contract). Without: complete-mode
    in-memory table named ``query_name`` for tests/inspection.
    """
    rolled = streaming_rollup(stream, key_cols, ts_col, value_col, tier, watermark)
    if output_path:
        return (
            rolled.writeStream.outputMode("append")
            .format("parquet")
            .option("path", output_path)
            .option("checkpointLocation", checkpoint_dir)
            .queryName(query_name)
            .trigger(availableNow=True)
            .start()
        )
    return (
        rolled.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
