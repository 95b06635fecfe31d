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


def start_tier_pipeline_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    output_dir: str,
    checkpoint_dir: str,
    tier: str = "1m",
    watermark: str = "10 minutes",
    query_name: str = "tier_pipeline_stream",
):
    """Continuous aggregate end-to-end: stream → finalized tier windows →
    MERGE into the persisted tier → re-encode exactly the Gorilla chunks
    the batch touched.

    ``foreachBatch`` receives only windows the watermark finalized, so
    every micro-batch is an incremental tier delta; the merge-write
    (plans/pipeline.py) replaces rows sharing (key, bucket) and keeps
    everything else, and chunk re-encoding is scoped to the touched
    (key, chunk_start) set via a broadcast semi-join — per-batch work is
    proportional to the DELTA, not the table, which is what keeps a
    year-long stream cheap.
    """
    import os

    from ..operators.bucket import time_bucket
    from ..operators.encode import _CHUNK_UNIT, encode_tier
    from ..plans.pipeline import _check_layout, _merge_write

    keys = list(key_cols)
    # the stream writes observed tier rows (v2 layout) and merges into
    # prior state — stamp fresh warehouses, refuse pre-versioning ones
    _check_layout(output_dir)
    tier_path = os.path.join(output_dir, f"tier={tier}")
    chunk_path = os.path.join(output_dir, f"chunks_tier={tier}")
    chunk_unit = _CHUNK_UNIT[tier]

    rolled = streaming_rollup(stream, keys, ts_col, value_col, tier, watermark)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.cache()
        _merge_write(
            spark, batch_df, tier_path, merge_keys=keys + ["bucket"],
            partition_by=keys[:1], merge=True,
        )
        touched = batch_df.select(
            *keys, F.date_trunc(chunk_unit, F.col("bucket")).alias("chunk_start")
        ).distinct()
        tier_df = spark.read.parquet(tier_path)
        affected = tier_df.withColumn(
            "chunk_start", F.date_trunc(chunk_unit, F.col("bucket"))
        ).join(F.broadcast(touched), on=keys + ["chunk_start"], how="left_semi").drop(
            "chunk_start"
        )
        enc = encode_tier(affected, keys, "bucket", "avg_value", tier)
        _merge_write(
            spark, enc, chunk_path, merge_keys=keys + ["chunk_start"], merge=True
        )
        # both merge-writes have materialized: drop the per-batch cache so
        # a long-running stream doesn't accumulate batch blocks
        batch_df.unpersist()

    return (
        rolled.writeStream.foreachBatch(handle_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
