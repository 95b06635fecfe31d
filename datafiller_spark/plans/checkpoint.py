"""High-water checkpointing for resumable incremental rollups.

The continuous-aggregate contract: each run processes only buckets past
the per-source high-water mark, re-aggregates them, and appends; a
re-run after failure is idempotent because tier rows are overwritten per
(source, bucket window), not blindly appended. On Iceberg the checkpoint
would be the snapshot id + a high-water table; on plain parquet (this
sandbox) the checkpoint is a small parquet table of
(source, max_bucket) — same protocol, different storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def checkpoint_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_checkpoint_high_water")


def read_high_water(spark: SparkSession, base_dir: str) -> DataFrame | None:
    path = checkpoint_path(base_dir)
    try:
        lazy = spark.read.parquet(path)
    except Exception:  # noqa: BLE001 — missing checkpoint == first run
        return None
    # Materialize eagerly: the same run overwrites this path at commit
    # time, and a lazy plan would then point at deleted files. The table
    # is one row per key — driver-side materialization is free.
    return spark.createDataFrame(lazy.collect(), lazy.schema)


def write_high_water(df_tier_1m: DataFrame, key_cols: list[str], base_dir: str) -> None:
    hw = df_tier_1m.groupBy(*key_cols).agg(F.max("bucket").alias("max_bucket"))
    hw.coalesce(1).write.mode("overwrite").parquet(checkpoint_path(base_dir))


def incremental_filter(
    raw: DataFrame,
    high_water: DataFrame | None,
    key_cols: list[str],
    ts_col: str,
) -> DataFrame:
    """Keep only rows strictly past each key's high-water bucket.

    Keys unseen in the checkpoint pass through untouched. The predicate
    is a broadcast join + filter, so at scale it prunes at the scan when
    the source table is partitioned on the key/time."""
    if high_water is None:
        return raw
    return (
        raw.join(F.broadcast(high_water), on=key_cols, how="left")
        .where(F.col("max_bucket").isNull() | (F.col(ts_col) > F.col("max_bucket")))
        .drop("max_bucket")
    )
