"""Tier encoding: rolled-up point streams → compact binary chunks.

``encode_tier`` packs each (key, chunk-of-buckets) into one row carrying
a Gorilla XOR / delta-of-delta payload (kernels/codec.py). Chunking by a
coarser calendar unit (default: day chunks for the 1m tier) bounds chunk
size and preserves partition pruning on the chunk column. ``decode_tier``
restores the exact point stream — the round-trip is bit-exact on float64
payloads, which is how the correctness oracle validates the codec at the
query level (encode∘decode composed with a rollup must hash-match the
plain rollup SQL).

Both directions are ``applyInPandas`` / explode over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..kernels.codec import decode_points, encode_points

_CHUNK_UNIT = {"1m": "day", "1h": "month", "1d": "year"}


def encode_tier(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    tier: str,
) -> DataFrame:
    """One binary chunk row per (key, chunk period)."""
    keys = list(key_cols)
    chunk_unit = _CHUNK_UNIT[tier]
    with_chunk = df.withColumn("chunk_start", F.date_trunc(chunk_unit, F.col(bucket_col)))

    out_schema = StructType()
    for k in keys:
        out_schema.add(df.schema[k])
    out_schema.add(with_chunk.schema["chunk_start"])
    out_schema.add("tier", "string")
    out_schema.add("n_points", "integer")
    out_schema.add("payload", "binary")

    def encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(bucket_col)
        ts = pdf[bucket_col].astype("datetime64[us]").astype("int64").to_numpy() // 1_000_000
        vals = pdf[value_col].astype("float64").to_numpy()
        payload = encode_points(ts.astype(np.int64), vals)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row["chunk_start"] = [pdf["chunk_start"].iloc[0]]
        row["tier"] = [tier]
        row["n_points"] = [len(pdf)]
        row["payload"] = [payload]
        return pd.DataFrame(row)

    return with_chunk.groupBy(*keys, "chunk_start").applyInPandas(
        encode_group, schema=out_schema
    )


def decode_tier(
    df: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str = "bucket",
    value_col: str = "value",
) -> DataFrame:
    """Explode chunk payloads back into (key, bucket, value) points."""
    keys = list(key_cols)

    out_schema = StructType()
    for k in keys:
        out_schema.add(df.schema[k])
    out_schema.add(bucket_col, "timestamp")
    out_schema.add(value_col, "double")

    def decode_batch(iterator):
        for pdf in iterator:
            if not len(pdf):
                continue
            # one concatenated frame per Arrow batch: decode every chunk,
            # then np.repeat the key columns by chunk point counts — no
            # per-row DataFrame construction
            decoded = [decode_points(bytes(p)) for p in pdf["payload"]]
            counts = np.array([len(ts) for ts, _ in decoded], dtype=np.int64)
            out = {
                bucket_col: pd.to_datetime(
                    np.concatenate([ts for ts, _ in decoded]), unit="s"
                ),
                value_col: np.concatenate([vals for _, vals in decoded]),
            }
            frame = pd.DataFrame(out)
            for k in keys:
                frame[k] = np.repeat(pdf[k].to_numpy(), counts)
            yield frame[[*keys, bucket_col, value_col]]

    return df.mapInPandas(decode_batch, schema=out_schema)
