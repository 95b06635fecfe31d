"""High-water checkpointing for resumable incremental rollups.

The continuous-aggregate contract: each run reprocesses only buckets at
or past the per-key high-water mark, re-aggregates them, and MERGES into
the persisted tier (new rows replace prior rows with the same
(key, bucket); untouched keys/buckets keep their history). The
high-water mark is the last bucket *seen*, treated as OPEN: a resume
reprocesses that bucket wholesale from raw, so sub-bucket-aligned late
rows inside it can never be double-counted — the re-aggregated bucket
row replaces the prior one instead of adding to it.

The caller hands the resume run the FULL raw table (an Iceberg
incremental read plus the open bucket's prior rows also satisfies the
contract); ``incremental_filter`` prunes everything strictly before the
open bucket. On Iceberg the checkpoint would be the snapshot id + a
high-water table; on plain parquet (this sandbox) it is a small parquet
table of (key, max_bucket) — same protocol, different storage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bucket import time_bucket


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


def write_high_water(
    df_tier_1m: DataFrame,
    key_cols: list[str],
    base_dir: str,
    prior: DataFrame | None = None,
) -> None:
    """Persist per-key max bucket, unioned with the prior checkpoint so
    keys with no new data this run retain their marks."""
    hw = df_tier_1m.groupBy(*key_cols).agg(F.max("bucket").alias("max_bucket"))
    if prior is not None:
        hw = (
            hw.unionByName(prior.select(*key_cols, "max_bucket"))
            .groupBy(*key_cols)
            .agg(F.max("max_bucket").alias("max_bucket"))
        )
    hw.coalesce(1).write.mode("overwrite").parquet(checkpoint_path(base_dir))


def incremental_filter(
    raw: DataFrame,
    high_water: DataFrame | None,
    key_cols: list[str],
    ts_col: str,
    tier: str = "1m",
) -> DataFrame:
    """Keep rows whose bucket is at or past the key's high-water bucket.

    The high-water bucket itself is OPEN and reprocessed wholesale (all
    its raw rows, not just post-mark ones), so the re-aggregated bucket
    row is complete and replaces the prior row on merge — idempotent for
    any sub-bucket timestamp alignment. Keys unseen in the checkpoint
    pass through untouched. The predicate is a broadcast join + filter,
    so at scale it prunes at the scan when the source table is
    partitioned on the key/time.
    """
    if high_water is None:
        return raw
    return (
        raw.join(F.broadcast(high_water), on=key_cols, how="left")
        .where(
            F.col("max_bucket").isNull()
            | (time_bucket(ts_col, tier) >= F.col("max_bucket"))
        )
        .drop("max_bucket")
    )
