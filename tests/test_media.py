"""From-scratch media codecs (kernels/media.py) + real multimodal decode.

Covers: BMP 24/32-bit round-trips (row padding, bottom-up and top-down),
WAV PCM round-trips across bit depths and float32, PNG round-trips for
gray/RGB/RGBA plus ALL FIVE scanline filters (hand-filtered fixtures),
error paths, and the Spark `extract_features` path on real payloads —
including the poisoned-payload contract (decode_ok=false, never a stage
failure) and the synthesize→decode formula parity that backs the
`multimodal_decode` driver oracle.
"""

import struct
import zlib

import numpy as np
import pytest

from datafiller_spark.exceptions import EngineValueError
from datafiller_spark.kernels.media import (
    _PNG_SIG,
    _png_chunk,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)
from datafiller_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_asset,
    extract_features,
    synthesize_assets,
)


def _det_image(h, w, c=None, seed=1):
    n = h * w * (c or 1)
    arr = ((np.arange(n, dtype=np.int64) * seed * 37 + 11) % 256).astype(np.uint8)
    return arr.reshape((h, w) if c is None else (h, w, c))


# ---------------------------------------------------------------- BMP

@pytest.mark.parametrize("w", [3, 4, 5, 17])  # exercise 0..3 bytes of row padding
def test_bmp_roundtrip_padding(w):
    img = _det_image(6, w, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_bmp_gray_input_broadcasts():
    gray = _det_image(4, 4)
    out = decode_bmp(encode_bmp(gray))
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out[:, :, 0], gray)


def test_bmp_32bit_topdown():
    # hand-built 32-bit top-down BI_RGB (encoder only writes 24-bit bottom-up)
    h, w = 3, 2
    rgba = _det_image(h, w, 4, seed=5)
    bgra = rgba[:, :, [2, 1, 0, 3]]  # stored order
    pixels = bgra.reshape(h, w * 4).tobytes()  # stride w*4 is already 4-aligned
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(pixels), 0, 0, 0, 0)
    out = decode_bmp(header + info + pixels)
    assert out.shape == (h, w, 4)
    assert np.array_equal(out, rgba)


def test_bmp_errors():
    with pytest.raises(EngineValueError):
        decode_bmp(b"notabmp")
    img = encode_bmp(_det_image(4, 4, 3))
    with pytest.raises(EngineValueError):
        decode_bmp(img[:40])  # truncated
    # unsupported compression flag
    bad = bytearray(img)
    struct.pack_into("<I", bad, 30, 1)
    with pytest.raises(EngineValueError):
        decode_bmp(bytes(bad))


# ---------------------------------------------------------------- WAV

def test_wav_roundtrip_int16_stereo():
    samples = (((np.arange(400, dtype=np.int64) * 97) % 4096) - 2048).astype(np.int16)
    samples = samples.reshape(200, 2)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    assert np.array_equal(out, samples)


def test_wav_float_input_scaled():
    x = np.linspace(-1.0, 1.0, 64)
    out, rate = decode_wav(encode_wav(x, 44100))
    assert out.shape == (64, 1) and rate == 44100
    assert int(out[0, 0]) == -32767 and int(out[-1, 0]) == 32767


def _wav_bytes(fmt_code, bits, raw, channels=1, rate=8000):
    width = bits // 8
    fmt = struct.pack("<HHIIHH", fmt_code, channels, rate,
                      rate * channels * width, channels * width, bits)
    return (b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(raw)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(raw)) + raw)


def test_wav_8_32_and_float_formats():
    u8 = np.array([0, 128, 255], dtype=np.uint8)
    out, _ = decode_wav(_wav_bytes(1, 8, u8.tobytes()))
    assert np.array_equal(out[:, 0], u8)
    i32 = np.array([-(2**31), 0, 2**31 - 1], dtype="<i4")
    out, _ = decode_wav(_wav_bytes(1, 32, i32.tobytes()))
    assert np.array_equal(out[:, 0], i32)
    f32 = np.array([-1.0, 0.25, 1.0], dtype="<f4")
    out, _ = decode_wav(_wav_bytes(3, 32, f32.tobytes()))
    assert np.array_equal(out[:, 0], f32)


def test_wav_odd_chunk_alignment():
    # a 3-byte junk chunk before data must be skipped with word alignment
    i16 = np.array([5, -5], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"junk" + struct.pack("<I", 3) + b"abc\x00"
            + b"data" + struct.pack("<I", 4) + i16.tobytes())
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, _ = decode_wav(data)
    assert np.array_equal(out[:, 0], i16)


def test_wav_errors():
    with pytest.raises(EngineValueError):
        decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(EngineValueError):
        decode_wav(_wav_bytes(1, 12, b"\x00" * 6))  # 12-bit unsupported
    with pytest.raises(EngineValueError):
        decode_wav(_wav_bytes(7, 16, b"\x00" * 4))  # mu-law unsupported


# ---------------------------------------------------------------- PNG

@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 3), (5, 7, 4)])
def test_png_roundtrip(shape):
    img = _det_image(*shape) if len(shape) == 2 else _det_image(shape[0], shape[1], shape[2])
    assert np.array_equal(decode_png(encode_png(img)), img)


def _png_filtered(img, filters):
    """Assemble PNG bytes applying a given filter id per scanline."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    recon = img.reshape(h, w * c).astype(np.int32)
    zeros = np.zeros(w * c, dtype=np.int32)
    body = bytearray()
    for y, ft in enumerate(filters):
        line, prev = recon[y], (recon[y - 1] if y else zeros)
        a = np.concatenate([np.zeros(c, np.int32), line[:-c]]) if w * c > c else zeros
        if ft == 0:
            filt = line
        elif ft == 1:
            filt = line - a
        elif ft == 2:
            filt = line - prev
        elif ft == 3:
            filt = line - ((a + prev) >> 1)
        else:  # Paeth
            b = prev
            cc = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
            p = a + b - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - cc)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, cc))
            filt = line - pred
        body.append(ft)
        body.extend((filt % 256).astype(np.uint8).tobytes())
    color = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
            + _png_chunk(b"IEND", b""))


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_all_five_filters(c):
    img = _det_image(5, 6, c if c > 1 else None, seed=3)
    data = _png_filtered(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), img)


def test_png_paeth_heavy():
    # every row Paeth-filtered over structured content (gradient + noise)
    grad = (np.add.outer(np.arange(16) * 7, np.arange(16) * 3) % 256).astype(np.uint8)
    img = ((grad.astype(np.int32) + _det_image(16, 16).astype(np.int32)) % 256).astype(np.uint8)
    assert np.array_equal(decode_png(_png_filtered(img, [4] * 16)), img)


def test_png_errors():
    with pytest.raises(EngineValueError):
        decode_png(b"nope")
    img16 = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    ) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _png_chunk(b"IEND", b"")
    with pytest.raises(EngineValueError):
        decode_png(img16)  # 16-bit depth unsupported
    # declared dims disagree with pixel bytes
    bad = _PNG_SIG + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 0, 0, 0, 0)
    ) + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5)) + _png_chunk(b"IEND", b"")
    with pytest.raises(EngineValueError):
        decode_png(bad)


# ------------------------------------- fast Average/Paeth defilter (r6)


def _defilter_naive(line, prev, out_prev_free, c, paeth):
    """The pre-round-6 per-byte reference loop — byte-parity anchor for
    both the compiled C row kernel and the pure-Python fallback."""
    stride = len(line)
    row = np.zeros(stride, dtype=np.uint8)
    for x in range(stride):
        a = int(row[x - c]) if x >= c else 0
        if paeth:
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            p = a + b - cc
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            row[x] = (int(line[x]) + pred) & 0xFF
        else:
            row[x] = (int(line[x]) + ((a + int(prev[x])) >> 1)) & 0xFF
    return row


@pytest.mark.parametrize("c", [1, 3, 4])
def test_png_defilter_paths_byte_identical(c):
    """C kernel, Python fallback, and the naive reference agree byte-
    for-byte on random rows for both recursive filters."""
    from datafiller_spark.kernels.media import (
        _defilter_avg_py,
        _defilter_lib,
        _defilter_paeth_py,
        _U8P,
    )

    rng = np.random.default_rng(123 + c)
    stride = 37 * c
    lib = _defilter_lib()
    for _ in range(5):
        line = rng.integers(0, 256, stride).astype(np.uint8)
        prev = rng.integers(0, 256, stride).astype(np.uint8)
        for paeth in (False, True):
            ref = _defilter_naive(line, prev, None, c, paeth)
            py = (_defilter_paeth_py if paeth else _defilter_avg_py)(line, prev, c)
            assert np.array_equal(ref, py), f"python fallback paeth={paeth} c={c}"
            if lib is not None:
                out = np.zeros(stride, dtype=np.uint8)
                fn = lib.defilter_paeth if paeth else lib.defilter_avg
                fn(
                    line.ctypes.data_as(_U8P),
                    prev.ctypes.data_as(_U8P),
                    out.ctypes.data_as(_U8P),
                    stride,
                    c,
                )
                assert np.array_equal(ref, out), f"C kernel paeth={paeth} c={c}"


def test_png_adaptive_encode_roundtrip_uses_recursive_filters():
    """Adaptive (MSAD) filtering on photographic-ish content emits
    Average/Paeth scanlines — the realistic decode path — and round-
    trips exactly; the filtered stream also compresses smaller."""
    rng = np.random.default_rng(9)
    h, w = 48, 40
    grad = np.add.outer(np.arange(h) * 5, np.arange(w) * 3) // 2
    img = ((grad % 256 + rng.integers(-6, 7, (h, w))) % 256).astype(np.uint8)
    rgb = np.stack([img, (img * 2) % 256, 255 - img], axis=2).astype(np.uint8)

    data = encode_png(rgb, filters="adaptive")
    assert np.array_equal(decode_png(data), rgb)
    # inspect the emitted filter bytes
    pos, idat = len(_PNG_SIG), []
    while pos + 8 <= len(data):
        size, ctype = struct.unpack_from(">I4s", data, pos)
        if ctype == b"IDAT":
            idat.append(data[pos + 8 : pos + 8 + size])
        pos += 12 + size
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    used = {raw[y * (stride + 1)] for y in range(h)}
    assert used & {3, 4}, f"adaptive never chose Average/Paeth: {used}"
    assert len(data) < len(encode_png(rgb)), "adaptive should beat filter-0 here"


def test_png_forced_filters_matches_independent_builder():
    """encode_png(filters=[ids]) must produce the same reconstruction
    as the test-side independent filtered-PNG builder for every id."""
    img = _det_image(5, 6, 3, seed=4)
    forced = [0, 1, 2, 3, 4]
    assert np.array_equal(decode_png(encode_png(img, filters=forced)), img)
    with pytest.raises(EngineValueError):
        encode_png(img, filters="mystery")
    with pytest.raises(EngineValueError):
        encode_png(img, filters=[0, 1])  # wrong length
    with pytest.raises(EngineValueError):
        encode_png(img, filters=[0, 1, 2, 3, 9])  # bad id


def test_png_defilter_speed_512_rgb():
    """The round-5 verdict's scale-killer: adaptive-filtered decode must
    be >=10x the naive per-byte loop on a 512x512 RGB all-Paeth image
    (C kernel path; skipped where no compiler exists)."""
    import time

    from datafiller_spark.kernels.media import _defilter_lib

    if _defilter_lib() is None:
        pytest.skip("no C compiler on this host; Python fallback only")
    rng = np.random.default_rng(2)
    big = rng.integers(0, 256, (512, 512, 3)).astype(np.uint8)
    data = encode_png(big, filters=[4] * 512)
    decode_png(data)  # warm (compile already cached by fixture above)
    t0 = time.perf_counter()
    out = decode_png(data)
    fast = time.perf_counter() - t0
    assert np.array_equal(out, big)
    # naive reference on a 64-row slice, extrapolated — keeps the test
    # under a second while still measuring real per-byte cost
    line = rng.integers(0, 256, 512 * 3).astype(np.uint8)
    prev = rng.integers(0, 256, 512 * 3).astype(np.uint8)
    t0 = time.perf_counter()
    for _ in range(64):
        _defilter_naive(line, prev, None, 3, paeth=True)
    naive = (time.perf_counter() - t0) * (512 / 64)
    assert naive / fast >= 10, f"only {naive / fast:.1f}x over naive ({fast*1e3:.1f} ms)"


def test_wav_24bit_pcm_decodes_to_fullscale_int32():
    """24-bit PCM (3-byte LE, no NumPy dtype — real audio corpora use
    it) widens losslessly to full-scale int32 (<< 8), so downstream
    int32 normalization (/ 2^31) keeps amplitudes right."""
    vals = [0, 1, -1, 8388607, -8388608, 123456, -654321]
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    wav = _wav_bytes(1, 24, raw, channels=1, rate=44100)
    out, rate = decode_wav(wav)
    assert rate == 44100 and out.dtype == np.int32
    assert out[:, 0].tolist() == [v << 8 for v in vals]
    # stereo: interleaved samples land in (n, 2); 18 bytes = 3 frames
    wav2 = _wav_bytes(1, 24, raw[:18], channels=2, rate=8000)
    out2, _ = decode_wav(wav2)
    assert out2.shape == (3, 2)
    assert out2[0].tolist() == [vals[0] << 8, vals[1] << 8]


def test_png_adam7_interlaced_roundtrip():
    """Adam7 PNGs (color types 0/2/6, every dims class that exercises
    empty passes) decode to the same pixels as the sequential form."""
    for shape in [(16, 16, 3), (9, 13, 3), (1, 1), (2, 2, 4), (3, 1), (1, 5, 3), (8, 8)]:
        img = _det_image(*shape) if len(shape) == 2 else _det_image(shape[0], shape[1], shape[2])
        inter = encode_png(img, interlace=True)
        assert np.array_equal(decode_png(inter), img), f"shape {shape}"
        # interlace byte actually set (not silently sequential)
        assert inter[len(_PNG_SIG) + 8 + 12] == 1
    with pytest.raises(EngineValueError):
        encode_png(_det_image(4, 4), filters="adaptive", interlace=True)
    # truncated interlaced pixel stream still raises
    img = _det_image(16, 16, 3)
    inter = bytearray(encode_png(img, interlace=True))
    # corrupt the IDAT length's payload by dropping trailing IDAT bytes
    with pytest.raises(EngineValueError):
        decode_png(bytes(inter[:-30]))


def test_wav_truncated_data_chunk_raises():
    """data chunk declaring more bytes than present must raise (round-5
    advice: consistent with BMP/PNG truncation behavior), not silently
    decode fewer samples."""
    good = encode_wav(np.arange(-8, 8, dtype=np.int16), 8000)
    truncated = good[:-6]  # cut mid-data; declared size now exceeds body
    with pytest.raises(EngineValueError, match="truncated WAV data"):
        decode_wav(truncated)


# --------------------------------------------------- decode_asset sniffing

def test_decode_asset_sniffs_formats():
    img = _det_image(4, 5, 3)
    assert np.array_equal(decode_asset(encode_png(img), "image"), img)
    assert np.array_equal(decode_asset(encode_bmp(img), "image"), img)
    samples = np.array([[1, -1]], dtype=np.int16)
    out, rate = decode_asset(encode_wav(samples, 16000), "audio")
    assert rate == 16000 and np.array_equal(out, samples)
    with pytest.raises(EngineValueError):
        decode_asset(b"GIF89a...", "image")
    with pytest.raises(NotImplementedError):
        decode_asset(b"\x00\x00\x00\x18ftypmp42", "video")


# --------------------------------------------------- Spark decode path

def test_extract_features_real_payloads(spark):
    img = _det_image(6, 9, 3)
    gray = _det_image(7, 4)
    wav = encode_wav((((np.arange(1200, dtype=np.int64) * 31) % 1024) - 512)
                     .astype(np.int16).reshape(600, 2), 12000)
    rows = [
        ("png_rgb", "image", bytearray(encode_png(img))),
        ("png_gray", "image", bytearray(encode_png(gray))),
        ("bmp", "image", bytearray(encode_bmp(img))),
        ("wav", "audio", bytearray(wav)),
        ("poisoned", "image", bytearray(b"not an image at all")),
        ("vid", "video", bytearray(b"\x00" * 100)),
    ]
    df = spark.createDataFrame(rows, ["asset_id", "kind", "payload"])
    out = {r.asset_id: r for r in extract_features(df).collect()}

    assert out["png_rgb"].decode_ok and (out["png_rgb"].width, out["png_rgb"].height,
                                         out["png_rgb"].channels) == (9, 6, 3)
    assert out["png_gray"].decode_ok and out["png_gray"].channels == 1
    assert out["bmp"].decode_ok and (out["bmp"].width, out["bmp"].height) == (9, 6)
    assert out["wav"].decode_ok and out["wav"].channels == 2
    assert out["wav"].sample_rate == 12000
    assert out["wav"].duration == pytest.approx(600 / 12000)
    # identical pixels through PNG and BMP must give identical features
    assert out["png_rgb"].features == out["bmp"].features
    for aid in ("png_rgb", "png_gray", "bmp", "wav"):
        assert len(out[aid].features) == FEATURE_DIM
        assert all(np.isfinite(out[aid].features))
    # poisoned + video: stage survives, decode_ok false, NULL features
    for aid in ("poisoned", "vid"):
        assert out[aid].decode_ok is False and out[aid].features is None


def test_synthesize_assets_matches_oracle_formulas(spark):
    ids = list(range(0, 40))
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    out = {int(r.asset_id): r for r in extract_features(synthesize_assets(df)).collect()}
    assert set(out) == set(ids)
    for i in ids:
        r = out[i]
        assert r.decode_ok, f"id {i} failed decode: {r.error}"
        if i % 10 == 6:
            assert r.kind == "video"
            assert (r.width, r.height) == (4 + i % 13, 3 + i % 7)
            assert r.channels == 3
            assert r.sample_rate is None
            assert abs(r.duration - (2 + i % 3) / 5.0) < 1e-6
        elif i % 2 == 0:
            assert r.kind == "image"
            assert (r.width, r.height) == (4 + i % 13, 3 + i % 7)
            assert r.channels == (1 if i % 4 == 0 else 3)
            assert r.sample_rate is None
        else:
            assert r.kind == "audio"
            assert r.channels == (2 if i % 3 == 0 else 1)
            assert r.sample_rate == 8000 + (i % 5) * 100
            assert r.width is None and r.height is None


# --------------------------------------------------- hardening (r5 review)

def test_png_zlib_bomb_bounded():
    # an IDAT inflating far beyond the declared dims must raise without
    # materializing the inflated stream (decompress is capped at the
    # declared scanline bytes + 1)
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)  # ~10 KB compressed
    png = (_PNG_SIG
           + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + _png_chunk(b"IDAT", bomb) + _png_chunk(b"IEND", b""))
    with pytest.raises(EngineValueError):
        decode_png(png)


def test_png_declared_dims_capped():
    # header lies about pixel count: rejected before any allocation
    huge = (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2**16, 2**16, 8, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00")) + _png_chunk(b"IEND", b""))
    with pytest.raises(EngineValueError):
        decode_png(huge)
    zero = (_PNG_SIG
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 0, 3, 8, 0, 0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"")) + _png_chunk(b"IEND", b""))
    with pytest.raises(EngineValueError):
        decode_png(zero)


def test_truncated_chunk_bodies_raise_engine_error():
    # short IHDR body: EngineValueError, not struct.error
    with pytest.raises(EngineValueError):
        decode_png(_PNG_SIG + _png_chunk(b"IHDR", b"\x00" * 5))
    # corrupt IDAT: EngineValueError, not zlib.error
    bad_idat = (_PNG_SIG
                + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
                + _png_chunk(b"IDAT", b"not zlib") + _png_chunk(b"IEND", b""))
    with pytest.raises(EngineValueError):
        decode_png(bad_idat)
    # WAV fmt chunk declaring 16 bytes but truncated: EngineValueError,
    # not struct.error
    wav = (b"RIFF" + struct.pack("<I", 20) + b"WAVEfmt "
           + struct.pack("<I", 16) + b"\x01\x00")
    with pytest.raises(EngineValueError):
        decode_wav(wav)


def test_encode_wav_rejects_out_of_range_ints():
    with pytest.raises(EngineValueError):
        encode_wav(np.array([[70000]], dtype=np.int32), 8000)
    # in-range wide ints still encode exactly
    out, rate = decode_wav(encode_wav(np.array([[1000], [-1000]], dtype=np.int32), 8000))
    assert rate == 8000 and out.flatten().tolist() == [1000, -1000]


def test_extract_features_null_payload_and_empty_wav(spark):
    from datafiller_spark.operators.multimodal import ASSET_SCHEMA, sample_frames

    empty_wav = encode_wav(np.zeros((0, 1), dtype=np.int16), 8000)
    rows = [("nul", "image", None), ("ewav", "audio", bytearray(empty_wav)),
            ("nulvid", "video", None)]
    df = spark.createDataFrame(rows, schema=ASSET_SCHEMA)
    out = {r.asset_id: r for r in extract_features(df).collect()}
    # NULL payload: row survives with decode_ok false (never fails the stage)
    assert out["nul"].decode_ok is False and out["nul"].n_bytes == 0
    # zero-sample WAV: decode_ok true with FINITE features (no NaN mean/std)
    assert out["ewav"].decode_ok and out["ewav"].duration == 0.0
    assert all(np.isfinite(out["ewav"].features))
    # NULL video payload: sample_frames emits no rows instead of raising
    assert sample_frames(df).filter("asset_id = 'nulvid'").count() == 0


def test_extract_features_error_column_distinguishes_causes(spark):
    """round-5 advice: a corrupt payload and an unsupported kind must be
    distinguishable in the output — the error column carries the
    decoder's message; successful decodes leave it NULL."""
    from datafiller_spark.operators.multimodal import ASSET_SCHEMA

    ok_png = encode_png(_det_image(3, 4, 3))
    rows = [
        ("good", "image", bytearray(ok_png)),
        ("corrupt", "image", bytearray(b"BMgarbage")),
        ("vid_mp4", "video", bytearray(b"\x00\x00\x00\x18ftypmp42")),
        ("vid_badavi", "video", bytearray(b"RIFF\xff\xff\xff\xffAVI junk")),
        ("weird", "hologram", bytearray(b"\x00\x01")),
    ]
    df = spark.createDataFrame(rows, schema=ASSET_SCHEMA)
    out = {r.asset_id: r for r in extract_features(df).collect()}
    assert out["good"].decode_ok and out["good"].error is None
    assert not out["corrupt"].decode_ok
    assert out["corrupt"].error.startswith("EngineValueError:")
    # unsupported container vs corrupt AVI: different error classes
    assert out["vid_mp4"].error.startswith("NotImplementedError:")
    assert out["vid_badavi"].error.startswith("EngineValueError:")
    assert "hologram" in out["weird"].error
