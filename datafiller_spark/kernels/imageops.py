"""Deterministic image transforms — pure NumPy, no media libraries.

The training-data-pipeline transforms the multimodal column needs after
decode: resize (nearest / bilinear), grayscale. All fully vectorized
(gather with precomputed index arrays + lerp), deterministic across
platforms (float64 arithmetic, half-pixel centers — the OpenCV/Pillow
``align_corners=False`` convention), and bounded by the same pixel cap
as the decoders.

Engine-new capability (SURVEY §2.4 multimodal); the datafiller
reference has no media path.
"""

from __future__ import annotations

import numpy as np

from ..exceptions import EngineValueError

_MAX_PIXELS = 64 * 1024 * 1024


def _check_size(out_h: int, out_w: int) -> None:
    if out_h <= 0 or out_w <= 0:
        raise EngineValueError(f"invalid resize target {out_w}x{out_h}.")
    if out_h * out_w > _MAX_PIXELS:
        raise EngineValueError(f"resize target {out_w}x{out_h} exceeds the pixel cap.")


def _as_hwc(img: np.ndarray) -> tuple[np.ndarray, bool]:
    img = np.asarray(img)
    if img.ndim == 2:
        return img[:, :, None], True
    if img.ndim == 3 and img.shape[2] in (1, 3, 4):
        return img, False
    raise EngineValueError("expected (H, W) or (H, W, 1|3|4) image array.")


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize with half-pixel centers: src index =
    floor((dst + 0.5) * scale). Integer upscales reproduce np.repeat
    exactly (pinned by tests)."""
    _check_size(out_h, out_w)
    arr, was_2d = _as_hwc(img)
    h, w = arr.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), w - 1)
    out = arr[rows[:, None], cols[None, :]]
    return out[:, :, 0] if was_2d else out


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize, half-pixel centers, edge-clamped — the standard
    ``align_corners=False`` convention. uint8 in → uint8 out (rounded);
    float in → float64 out. Identity size is exact."""
    _check_size(out_h, out_w)
    arr, was_2d = _as_hwc(img)
    h, w = arr.shape[:2]
    src_y = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0.0, h - 1.0)
    src_x = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0.0, w - 1.0)
    y0 = np.floor(src_y).astype(np.int64)
    x0 = np.floor(src_x).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (src_y - y0)[:, None, None]
    fx = (src_x - x0)[None, :, None]
    a = arr[y0[:, None], x0[None, :]].astype(np.float64)
    b = arr[y0[:, None], x1[None, :]].astype(np.float64)
    c = arr[y1[:, None], x0[None, :]].astype(np.float64)
    d = arr[y1[:, None], x1[None, :]].astype(np.float64)
    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    out = top + (bot - top) * fy
    if np.issubdtype(np.asarray(img).dtype, np.integer):
        out = np.clip(np.round(out), 0, 255).astype(np.uint8)
    if was_2d:
        out = out[:, :, 0]
    return out


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """(H, W[, C]) → (H, W) uint8 via BT.601 luma (matches the JPEG
    codec's Y channel definition); gray input passes through."""
    arr = np.asarray(img)
    if arr.ndim == 2:
        return arr.astype(np.uint8)
    arr, _ = _as_hwc(arr)
    if arr.shape[2] == 1:
        return arr[:, :, 0].astype(np.uint8)
    f = arr[:, :, :3].astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)
