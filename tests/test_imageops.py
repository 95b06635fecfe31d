"""Image transforms (kernels/imageops.py) + the thumbnails operator.

Resize correctness is pinned by exact identities (integer-factor
nearest == np.repeat, identity-size bilinear == input, hand-computed
lerp values at half-pixel centers), not by comparison with a library
this container doesn't ship.
"""

import numpy as np
import pytest

from datafiller_spark.exceptions import EngineValueError
from datafiller_spark.kernels.imageops import (
    resize_bilinear,
    resize_nearest,
    to_grayscale,
)
from datafiller_spark.kernels.jpeg import encode_jpeg
from datafiller_spark.kernels.media import decode_png, encode_bmp, encode_png, encode_wav
from datafiller_spark.kernels.video import mux_avi
from datafiller_spark.operators.multimodal import thumbnails


def _img(h, w, c=3, seed=1):
    n = h * w * c
    return ((np.arange(n, dtype=np.int64) * seed * 37 + 11) % 256).astype(np.uint8).reshape(h, w, c)


def test_nearest_integer_upscale_is_repeat():
    img = _img(3, 4)
    out = resize_nearest(img, 6, 8)
    assert np.array_equal(out, np.repeat(np.repeat(img, 2, 0), 2, 1))


def test_nearest_downscale_picks_centers():
    row = np.arange(8, dtype=np.uint8)[None, :, None]
    out = resize_nearest(row, 1, 4)
    # centers at (d+0.5)*2 -> floor = 1, 3, 5, 7
    assert out[0, :, 0].tolist() == [1, 3, 5, 7]


def test_bilinear_identity_is_exact():
    img = _img(5, 7)
    assert np.array_equal(resize_bilinear(img, 5, 7), img)


def test_bilinear_2x_known_values():
    # 1-D ramp: dst x=1 maps to src 0.25 -> 0.75*a + 0.25*b
    row = np.array([[0, 100]], dtype=np.uint8)[:, :, None]
    out = resize_bilinear(row, 1, 4)
    assert out[0, :, 0].tolist() == [0, 25, 75, 100]


def test_bilinear_downscale_average():
    # 2x2 -> 1x1 with half-pixel centers hits the exact 4-pixel average
    img = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    assert resize_bilinear(img, 1, 1).item() == 25


def test_bilinear_gray_and_float_paths():
    img = _img(4, 4)[:, :, 0]
    out = resize_bilinear(img, 8, 8)
    assert out.shape == (8, 8) and out.dtype == np.uint8
    f = img.astype(np.float64)
    outf = resize_bilinear(f, 2, 2)
    assert outf.dtype == np.float64


def test_grayscale_matches_bt601():
    img = _img(3, 3)
    y = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    assert np.array_equal(to_grayscale(img), np.clip(np.round(y), 0, 255).astype(np.uint8))
    gray = img[:, :, 0]
    assert np.array_equal(to_grayscale(gray), gray)


def test_resize_errors():
    img = _img(2, 2)
    with pytest.raises(EngineValueError):
        resize_nearest(img, 0, 4)
    with pytest.raises(EngineValueError):
        resize_bilinear(img, 100_000, 100_000)  # pixel cap
    with pytest.raises(EngineValueError):
        resize_bilinear(np.zeros((2, 2, 7)), 2, 2)  # bad channel count


def test_thumbnails_operator(spark):
    png = encode_png(_img(6, 9))
    bmp = encode_bmp(_img(5, 4))
    jpg = encode_jpeg(_img(16, 16))
    avi = mux_avi([encode_jpeg(_img(12, 10, seed=2)) for _ in range(2)], 5, 10, 12)
    wav = encode_wav(np.arange(-8, 8, dtype=np.int16), 8000)
    rows = [
        ("png", "image", bytearray(png)),
        ("bmp", "image", bytearray(bmp)),
        ("jpg", "image", bytearray(jpg)),
        ("vid", "video", bytearray(avi)),
        ("aud", "audio", bytearray(wav)),
        ("bad", "image", bytearray(b"BMnope")),
    ]
    df = spark.createDataFrame(rows, ["asset_id", "kind", "payload"])
    out = {r.asset_id: r for r in thumbnails(df, out_h=8, out_w=8).collect()}
    assert len(out) == 6
    for aid, (sw, sh) in {"png": (9, 6), "bmp": (4, 5), "jpg": (16, 16), "vid": (10, 12)}.items():
        r = out[aid]
        assert r.decode_ok and (r.src_width, r.src_height) == (sw, sh)
        assert (r.width, r.height) == (8, 8)
        thumb = decode_png(bytes(r.payload))
        assert thumb.shape[:2] == (8, 8)
    # exact content pin for the lossless input: thumbnail == direct resize
    direct = resize_bilinear(decode_png(png), 8, 8)
    assert np.array_equal(decode_png(bytes(out["png"].payload)), direct)
    for aid in ("aud", "bad"):
        r = out[aid]
        assert not r.decode_ok and r.payload is None and r.width is None
