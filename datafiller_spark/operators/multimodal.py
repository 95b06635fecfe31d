"""Multimodal columns: image/audio/video as opaque binary + typed stats.

Asset table shape: (asset_id string, kind string in {image,audio,video},
payload binary). Decoding runs inside Arrow-batched ``mapInPandas``
tasks — per-asset CPU on the executors, nothing driver-side, so the
operator scales with the cluster like any other scan.

Decode support (from-scratch codecs, ``kernels/media.py`` /
``kernels/jpeg.py`` / ``kernels/video.py`` — the container ships no
media libraries):

- image: PNG (8-bit gray/RGB/RGBA), BMP (24/32-bit BI_RGB), and
  baseline JPEG (Huffman sequential, 4:4:4/4:2:2/4:2:0), sniffed by
  magic bytes;
- audio: RIFF/WAVE PCM (8/16/32-bit int, 32-bit float);
- video: MJPEG-in-AVI (the one format decodable with no codec
  library) — real frame decode via the from-scratch JPEG decoder;
  other containers (MP4/H.264 etc.) still raise
  ``NotImplementedError`` honestly, and ``sample_frames`` emits
  byte-window statistics for them instead of fake pixels.

A corrupt or unrecognized payload must not kill a 100 TB stage:
``extract_features`` marks the row ``decode_ok = false`` with the
decoder's message in ``error`` instead of raising; only
``decode_asset`` (the library surface) raises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..exceptions import EngineValueError
from ..spread import spread_input
from ..kernels.jpeg import decode_jpeg, encode_jpeg
from ..kernels.media import (
    _PNG_SIG,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)
from ..kernels.video import decode_video, demux_avi, first_frame, is_avi, mux_avi

FEATURE_DIM = 16

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def decode_asset(payload: bytes, kind: str):
    """Decode one asset payload.

    - ``kind='image'`` → (H, W[, C]) uint8 array (PNG, BMP or baseline
      JPEG, sniffed by magic bytes);
    - ``kind='audio'`` → ((n_samples, channels) array, sample_rate);
    - ``kind='video'`` → (list of (H, W[, 3]) uint8 frames, fps) for
      MJPEG-in-AVI; other containers raise NotImplementedError (no
      codec library in this environment).
    """
    if kind == "image":
        if payload.startswith(_PNG_SIG):
            return decode_png(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg(payload)
        raise EngineValueError("image payload is not PNG, BMP or JPEG.")
    if kind == "audio":
        return decode_wav(payload)
    if kind == "video":
        if is_avi(payload):
            return decode_video(payload)
        raise NotImplementedError(
            "only MJPEG-in-AVI video decodes without a codec library; "
            "sample_frames emits byte-window stats for other containers."
        )
    raise NotImplementedError(f"no decoder for kind={kind!r}")


def _normalize_samples(samples: np.ndarray) -> np.ndarray:
    """PCM in native width → float64 in [-1, 1]."""
    if samples.dtype == np.uint8:
        return (samples.astype(np.float64) - 128.0) / 128.0
    if samples.dtype == np.int16:
        return samples.astype(np.float64) / 32768.0
    if samples.dtype == np.int32:
        return samples.astype(np.float64) / 2147483648.0
    return samples.astype(np.float64)


def _image_features(img: np.ndarray) -> tuple[np.ndarray, int, int, int]:
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    gray = img[:, :, :3].mean(axis=2, dtype=np.float64)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 256.0))
    feats = np.array(
        [
            w,
            h,
            c,
            w / h,
            float(gray.mean()),
            float(gray.std()),
            float(img.min()),
            float(img.max()),
            *(hist / gray.size),
        ],
        dtype=np.float32,
    )
    return feats, w, h, c


def _audio_features(samples: np.ndarray, rate: int) -> tuple[np.ndarray, int, int, float]:
    n, ch = samples.shape
    x = _normalize_samples(samples).mean(axis=1)  # mono mix
    duration = n / rate if rate else 0.0
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / max(n - 1, 1)
    hist, _ = np.histogram(np.abs(x), bins=6, range=(0.0, 1.0))
    feats = np.array(
        [
            n,
            ch,
            rate,
            duration,
            float(x.mean()) if n else 0.0,
            float(x.std()) if n else 0.0,
            float(x.min()) if n else 0.0,
            float(x.max()) if n else 0.0,
            float(np.sqrt(np.mean(x * x))) if n else 0.0,
            zc,
            *(hist / max(n, 1)),
        ],
        dtype=np.float32,
    )
    return feats, ch, rate, duration


def extract_features(df: DataFrame) -> DataFrame:
    """(asset_id, kind, payload) → typed metadata + a FEATURE_DIM-float
    feature vector per asset, via the real decoders.

    Output: (asset_id, kind, n_bytes, decode_ok, width, height,
    channels, sample_rate, duration, features, error). Image rows fill
    width/height/channels; audio rows fill channels/sample_rate/
    duration; undecodable payloads (and video) get decode_ok = false
    with NULL features and the decoder's message in ``error`` — a
    poisoned asset never fails the stage, but only the errors the
    decoders intentionally raise (``EngineValueError`` for corrupt
    payloads, ``NotImplementedError`` for unsupported kinds) are
    swallowed; a programming bug in the feature code still surfaces,
    so systematic failures stay distinguishable from corrupt data.
    """
    out_schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("kind", StringType()),
            StructField("n_bytes", IntegerType()),
            StructField("decode_ok", BooleanType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("duration", FloatType()),
            StructField("features", ArrayType(FloatType())),
            StructField("error", StringType()),
        ]
    )

    def batches(iterator):
        for pdf in iterator:
            # columnar accumulation: typed lists per output column (one
            # pd.DataFrame built from arrays at the end) instead of a
            # per-asset dict + list-of-dicts DataFrame — the decode loop
            # is inherent to variable-length binary, the row assembly
            # isn't
            m = len(pdf)
            n_bytes = np.zeros(m, dtype=np.int64)
            ok = np.zeros(m, dtype=bool)
            width = [None] * m
            height = [None] * m
            channels = [None] * m
            s_rate = [None] * m
            duration = [None] * m
            features = [None] * m
            error = [None] * m
            for i, (kind, payload) in enumerate(zip(pdf["kind"], pdf["payload"])):
                payload = b"" if payload is None else bytes(payload)
                n_bytes[i] = len(payload)
                try:
                    if kind == "image":
                        feats, w, h, c = _image_features(decode_asset(payload, kind))
                        ok[i] = True
                        width[i], height[i], channels[i] = w, h, c
                        features[i] = feats.tolist()
                    elif kind == "audio":
                        samples, rate = decode_asset(payload, kind)
                        feats, ch, rate, dur = _audio_features(samples, rate)
                        ok[i] = True
                        channels[i], s_rate[i], duration[i] = ch, rate, dur
                        features[i] = feats.tolist()
                    elif kind == "video" and is_avi(payload):
                        # metadata from the container + ONE decoded frame
                        # (first) — never all frames in the scan stage
                        frame, n_frames, fps = first_frame(payload)
                        feats, w, h, c = _image_features(frame)
                        ok[i] = True
                        width[i], height[i], channels[i] = w, h, c
                        duration[i] = n_frames / fps if fps else 0.0
                        features[i] = feats.tolist()
                    else:
                        # non-AVI video / unknown: decode_asset states why
                        decode_asset(payload, kind)
                except (EngineValueError, NotImplementedError) as exc:
                    # only the errors the decoders intentionally raise;
                    # anything else is a bug and must fail the task
                    error[i] = f"{type(exc).__name__}: {exc}"
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "n_bytes": n_bytes,
                    "decode_ok": ok,
                    "width": width,
                    "height": height,
                    "channels": channels,
                    "sample_rate": s_rate,
                    "duration": duration,
                    "features": features,
                    "error": error,
                }
            )

    return spread_input(df.select("asset_id", "kind", "payload")).mapInPandas(
        batches, schema=out_schema
    )


def synthesize_assets(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixtures from an integer id column — REAL
    PNG/BMP/WAV bytes encoded in-task via ``kernels/media.py``, no
    external data, no driver involvement (encoding runs inside the same
    ``mapInPandas`` batches that a production ingest would use).

    The metadata formulas are pure functions of the id, mirrored in the
    driver query's SQL oracle (``multimodal_decode``):

    - ``id % 10 == 6`` → video: MJPEG-in-AVI, ``width = 4 + id % 13``,
      ``height = 3 + id % 7``, ``n_frames = 2 + id % 3``, fps 5
      (duration = n_frames / 5); frames are real baseline JPEGs;
    - other even ``id`` → image: ``id % 4 == 0`` PNG grayscale,
      ``id % 12 == 2`` baseline JPEG RGB (4:4:4 q95 — metadata is
      exact even though pixels are lossy), else BMP RGB;
      ``width = 4 + id % 13``, ``height = 3 + id % 7``;
    - ``id`` odd → WAV PCM-16: ``channels = 2 if id % 3 == 0 else 1``,
      ``sample_rate = 8000 + (id % 5) * 100``.
    """

    def batches(iterator):
        for pdf in iterator:
            rows = []
            for raw_id in pdf[id_col]:
                i = int(raw_id)
                if i % 10 == 6:
                    w, h = 4 + i % 13, 3 + i % 7
                    n_frames = 2 + i % 3
                    frames = []
                    for t in range(n_frames):
                        base = (np.arange(h * w, dtype=np.int64) * (i + 1) + t * 17) % 256
                        img = np.stack([(base + k * 31) % 256 for k in range(3)], axis=1)
                        frames.append(
                            encode_jpeg(
                                img.reshape(h, w, 3).astype(np.uint8),
                                quality=92,
                                subsampling="420" if i % 20 == 6 else "444",
                            )
                        )
                    payload = mux_avi(frames, 5, w, h)
                    kind = "video"
                elif i % 2 == 0:
                    w, h = 4 + i % 13, 3 + i % 7
                    base = (np.arange(h * w, dtype=np.int64) * (i + 1)) % 256
                    if i % 4 == 0:
                        payload = encode_png(base.reshape(h, w).astype(np.uint8))
                    else:
                        img = np.stack([(base + k * 31) % 256 for k in range(3)], axis=1)
                        img = img.reshape(h, w, 3).astype(np.uint8)
                        if i % 12 == 2:  # JPEG image coverage in the oracle path
                            payload = encode_jpeg(img, quality=95)
                        else:
                            payload = encode_bmp(img)
                    kind = "image"
                else:
                    ch = 2 if i % 3 == 0 else 1
                    rate = 8000 + (i % 5) * 100
                    n = 64 + i % 32
                    t = np.arange(n * ch, dtype=np.int64).reshape(n, ch)
                    samples = (((t * (i + 7)) % 2048) - 1024).astype(np.int16)
                    payload = encode_wav(samples, rate)
                    kind = "audio"
                rows.append({"asset_id": str(i), "kind": kind, "payload": payload})
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload"])

    # ids are a handful of bytes per row: spreading an under-split scan
    # costs a trivial exchange and lets the per-asset encoders (and every
    # decoder chained downstream in the same stage) use the whole cluster
    return spread_input(df.select(id_col)).mapInPandas(batches, schema=ASSET_SCHEMA)


def thumbnails(
    df: DataFrame,
    out_h: int = 8,
    out_w: int = 8,
    method: str = "bilinear",
    grayscale: bool = False,
) -> DataFrame:
    """Decode → resize → re-encode thumbnail pipeline over the asset
    table's image rows (the standard training-data normalization step).

    Output: (asset_id, src_width, src_height, width, height, decode_ok,
    payload) — ``payload`` is the resized image re-encoded as PNG
    (filter-0; deterministic bytes for a given input). Video rows
    thumbnail their FIRST decoded frame; audio rows and undecodable
    payloads pass through with ``decode_ok = false`` and NULL payload.
    Resize is the half-pixel-center convention in
    ``kernels/imageops.py`` (nearest or bilinear), fully vectorized —
    the whole operator is one ``mapInPandas`` scan, no shuffle.
    """
    from ..kernels.imageops import resize_bilinear, resize_nearest, to_grayscale

    if method not in ("bilinear", "nearest"):
        raise EngineValueError(f"unknown resize method {method!r}.")
    resize = resize_bilinear if method == "bilinear" else resize_nearest
    out_schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("src_width", IntegerType()),
            StructField("src_height", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("decode_ok", BooleanType()),
            StructField("payload", BinaryType()),
        ]
    )

    def batches(iterator):
        for pdf in iterator:
            m = len(pdf)
            sw = [None] * m
            sh = [None] * m
            ok = np.zeros(m, dtype=bool)
            out_payload = [None] * m
            for i, (kind, payload) in enumerate(zip(pdf["kind"], pdf["payload"])):
                payload = b"" if payload is None else bytes(payload)
                try:
                    if kind == "image":
                        img = decode_asset(payload, kind)
                    elif kind == "video" and is_avi(payload):
                        img, _n, _fps = first_frame(payload)
                    else:
                        continue
                    sh[i], sw[i] = int(img.shape[0]), int(img.shape[1])
                    small = resize(img, out_h, out_w)
                    if grayscale:
                        small = to_grayscale(small)
                    out_payload[i] = encode_png(small)
                    ok[i] = True
                except (EngineValueError, NotImplementedError):
                    continue  # poisoned asset: decode_ok stays false
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "src_width": sw,
                    "src_height": sh,
                    "width": [out_w if o else None for o in ok],
                    "height": [out_h if o else None for o in ok],
                    "decode_ok": ok,
                    "payload": out_payload,
                }
            )

    return spread_input(df.select("asset_id", "kind", "payload")).mapInPandas(
        batches, schema=out_schema
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    every_n_frames: int = 1,
) -> DataFrame:
    """One row per sampled frame of a video payload.

    MJPEG-in-AVI payloads get REAL decoded frames: ``frame_no`` is the
    frame's index in the stream (every ``every_n_frames``-th, up to
    ``max_frames``), ``offset`` its byte offset inside the payload, and
    ``features`` the same 16-float image feature vector
    ``extract_features`` computes (w/h/c, aspect, gray mean/std,
    min/max, 8-bin histogram). Only the sampled frames are
    JPEG-decoded — container demux reads chunk headers, so skipping is
    O(bytes scanned), not O(frames decoded).

    Other containers (no codec library for H.264 etc.) fall back to
    HONEST byte-window statistics (window mean/std/min/max + 4-bin byte
    histogram) at ``every_n_bytes`` offsets — deterministic, clearly
    not pixels. A corrupt AVI/frame is skipped, never a stage failure.
    """
    out_schema = StructType(
        [
            StructField("asset_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("offset", IntegerType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def _window_stats(window: bytes) -> list:
        b = np.frombuffer(window, dtype=np.uint8)
        if not len(b):
            return [0.0] * 8
        hist, _ = np.histogram(b, bins=4, range=(0.0, 256.0))
        return [
            float(len(b)),
            float(b.mean()),
            float(b.std()),
            float(b.max() - b.min()),
            *(hist / len(b)).astype(np.float32).tolist(),
        ]

    def batches(iterator):
        for pdf in iterator:
            rows = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or payload is None:
                    continue
                payload = bytes(payload)
                if is_avi(payload):
                    try:
                        jpegs, _fps, offs = demux_avi(payload)
                    except EngineValueError:
                        continue  # corrupt container: no rows, no failure
                    picked = list(range(0, len(jpegs), max(every_n_frames, 1)))
                    for i in picked[:max_frames]:
                        try:
                            feats, _w, _h, _c = _image_features(decode_jpeg(jpegs[i]))
                        except EngineValueError:
                            continue  # one corrupt frame: skip it
                        rows.append(
                            {
                                "asset_id": aid,
                                "frame_no": i,
                                "offset": offs[i],
                                "features": feats.tolist(),
                            }
                        )
                    continue
                offsets = list(range(0, len(payload), every_n_bytes))[:max_frames]
                for i, off in enumerate(offsets):
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_no": i,
                            "offset": off,
                            "features": _window_stats(payload[off : off + every_n_bytes]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "offset", "features"])

    return spread_input(df.select("asset_id", "kind", "payload")).mapInPandas(
        batches, schema=out_schema
    )
