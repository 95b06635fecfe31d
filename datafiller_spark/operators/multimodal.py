"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side machinery is real and tested — schema, partition-friendly
batching, Arrow-vectorized UDF signatures, deterministic feature shape —
while the actual media decode is stubbed: codec libraries (Pillow,
ffmpeg, torchaudio) are not in this container. The stub is a clearly
marked seam: swap ``_decode_stub`` for a real decoder and nothing else
changes.

Asset table shape: (asset_id string, kind string in {image,audio,video},
payload binary, meta map<string,string>).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 16

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: deterministic fake 'decoded features' from the payload hash.

    Real deployment: decode image/audio/video here (PIL/ffmpeg) and
    feature-extract. Raises for unknown kinds exactly like a real
    decoder would.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(df: DataFrame) -> DataFrame:
    """(asset_id, kind, payload) → (asset_id, kind, n_bytes, features).

    mapInPandas keeps Arrow batching; per-batch NumPy, no per-row Python
    at the Spark layer.
    """
    out_schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("kind", StringType()),
            StructField("n_bytes", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def batches(iterator):
        for pdf in iterator:
            feats = [
                _decode_stub(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": feats,
                }
            )

    return df.select("asset_id", "kind", "payload").mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: one row per sampled offset of a video
    payload. The offsets/batching are real; the frame decode is the same
    stub seam as above."""
    out_schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("offset", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def batches(iterator):
        for pdf in iterator:
            rows = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if kind != "video":
                    continue
                payload = bytes(payload)
                offsets = list(range(0, len(payload), every_n_bytes))[:max_frames]
                for i, off in enumerate(offsets):
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_no": i,
                            "offset": off,
                            "features": _decode_stub(payload[off : off + every_n_bytes], "video").tolist(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "offset", "features"])

    return df.select("asset_id", "kind", "payload").mapInPandas(batches, schema=out_schema)
