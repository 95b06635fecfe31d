"""From-scratch media codecs — stdlib + NumPy only.

The container ships no media libraries (Pillow/ffmpeg/soundfile), but
three production formats need none:

- **BMP** (Windows bitmap): uncompressed ``BI_RGB`` 24/32-bit with a
  ``BITMAPINFOHEADER`` — plain struct parsing, row padding, bottom-up
  row order. No compression spec at all.
- **WAV** (RIFF PCM): chunked container, integer PCM 8/16/24/32-bit
  (24-bit widened losslessly to full-scale int32) and IEEE-float
  32-bit payloads.
- **PNG**: 8-bit grayscale / RGB / RGBA (color types 0/2/6),
  sequential or Adam7-interlaced — zlib inflate (stdlib) + the five
  scanline filters (None/Sub/Up/Average/Paeth) from the PNG spec.

These are the real decoders behind ``operators/multimodal.py``'s
``extract_features`` (the engine-new multimodal requirement, SURVEY
§2.4; the reference has no media path). Encoders exist for the same
formats so tests and the entry query can synthesize deterministic
fixtures without any external data.

Scale note: decoding runs inside Arrow-batched ``mapInPandas`` tasks —
per-asset CPU, zero driver involvement. BMP/WAV decode is pure
``np.frombuffer`` reshaping. PNG None/Sub/Up filters are vectorized
per scanline (per-row Python bounded by image height); Average/Paeth
carry a sequential data dependence along x that NumPy cannot express
(the mod-256 wraparound defeats both prefix scans and
contraction/speculation tricks), so they use a tiny self-compiled C
row kernel (``_defilter_lib``, ~40 lines, built once per worker
process with the system ``cc`` via ctypes — the standard no-dependency
route where Numba is unavailable) and fall back to a tuned
pure-Python-int loop when no compiler exists. Real corpora are
libpng-adaptive-filtered, i.e. mostly Average/Paeth scanlines, so this
is the hot decode path at scale. Inflate is bounded: the declared
pixel count is capped (``_MAX_PIXELS``) and ``decompressobj`` never
allocates more than the declared scanline bytes + 1, so a zlib bomb
errors instead of OOMing the executor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..exceptions import EngineValueError
from . import cext


# ---------------------------------------------------------------- BMP

def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (H, W, 3|4) uint8 (RGB[A]).

    Supports BITMAPINFOHEADER (and its larger extensions — V4/V5 share
    the first 40 bytes), bottom-up and top-down row order.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise EngineValueError("not a BMP payload (missing 'BM' magic).")
    pixel_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise EngineValueError(f"unsupported BMP header size {header_size} (need >= 40).")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise EngineValueError(f"unsupported BMP compression {compression} (BI_RGB only).")
    if bpp not in (24, 32):
        raise EngineValueError(f"unsupported BMP bit depth {bpp} (24/32 only).")
    if width <= 0 or height == 0:
        raise EngineValueError(f"invalid BMP dimensions {width}x{height}.")
    top_down = height < 0
    height = abs(height)
    channels = bpp // 8
    stride = ((width * channels + 3) // 4) * 4
    need = pixel_offset + stride * height
    if len(data) < need:
        raise EngineValueError(f"truncated BMP: need {need} bytes, have {len(data)}.")
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * height, offset=pixel_offset)
    rows = rows.reshape(height, stride)[:, : width * channels].reshape(height, width, channels)
    if not top_down:
        rows = rows[::-1]
    # BMP stores BGR(A); emit RGB(A)
    if channels == 3:
        return np.ascontiguousarray(rows[:, :, ::-1])
    return np.ascontiguousarray(rows[:, :, [2, 1, 0, 3]])


def encode_bmp(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise EngineValueError("encode_bmp expects an (H, W, 3) uint8 array.")
    h, w, _ = arr.shape
    stride = ((w * 3 + 3) // 4) * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


# ---------------------------------------------------------------- WAV

def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → ((n_samples, channels) array, sample_rate).

    Integer PCM comes back in its native width (uint8 / int16 / int32;
    24-bit is widened losslessly to FULL-SCALE int32, i.e. << 8),
    format-3 payloads as float32 — callers normalize as they need.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise EngineValueError("not a WAV payload (missing RIFF/WAVE magic).")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # actual bytes present, not the declared size
                raise EngineValueError("truncated WAV fmt chunk.")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            if len(body) < size:  # declared more bytes than are present
                raise EngineValueError(
                    f"truncated WAV data chunk: declares {size} bytes, "
                    f"has {len(body)}."
                )
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise EngineValueError("WAV payload missing fmt/data chunk.")
    audio_format, channels, rate, _, _, bits = fmt
    if channels < 1:
        raise EngineValueError("WAV payload declares zero channels.")
    if audio_format == 1:
        if bits == 24:
            # 3-byte little-endian PCM has no NumPy dtype: widen to
            # int32 by byte assembly + sign extension, then shift to
            # the full int32 scale (lossless, and downstream int32
            # normalization — samples / 2^31 — stays correct)
            n = len(raw) // (3 * channels)
            b = np.frombuffer(raw, dtype=np.uint8, count=n * channels * 3)
            b = b.reshape(-1, 3).astype(np.int32)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v) << 8
            return v.reshape(n, channels), rate
        dtype = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}.get(bits)
        if dtype is None:
            raise EngineValueError(f"unsupported PCM bit depth {bits}.")
    elif audio_format == 3:
        if bits != 32:
            raise EngineValueError(f"unsupported float WAV bit depth {bits}.")
        dtype = np.dtype("<f4")
    else:
        raise EngineValueError(f"unsupported WAV audio format {audio_format}.")
    width = np.dtype(dtype).itemsize
    n = len(raw) // (width * channels)
    samples = np.frombuffer(raw, dtype=dtype, count=n * channels).reshape(n, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n, channels) int16 (or float in [-1, 1], scaled) → PCM WAV bytes.

    Integer inputs wider than int16 must already fit the int16 range —
    anything else raises instead of silently truncating to the low 16
    bits (a decoded 32-bit PCM file must be rescaled by the caller).
    """
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    if np.issubdtype(samples.dtype, np.floating):
        samples = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    else:
        if samples.size and (samples.min() < -32768 or samples.max() > 32767):
            raise EngineValueError(
                "encode_wav: integer samples exceed the int16 range; "
                "rescale (or normalize to float) before encoding."
            )
        samples = samples.astype("<i2")
    n, channels = samples.shape
    raw = samples.tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(raw))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(raw))
        + raw
    )


# ------------------------------------------- PNG Average/Paeth defilter
#
# The two recursive scanline filters (recon[x] depends on recon[x-c])
# are the only part of the decoder NumPy cannot vectorize. The fast
# path calls the shared self-compiled C helper (``kernels/cext.py``,
# built once per worker process) — per-row cost drops from ~1.6 ms
# (Python) to ~20 µs on a 512x3 RGB row. Where no compiler exists the
# tuned pure-Python-int fallback (~3x the naive numpy-scalar loop)
# keeps the decoder fully functional and byte-identical
# (golden-tested).

_U8P = cext.U8P


def _defilter_lib():
    """The shared C helper library, or None (no compiler /
    ``DATAFILLER_SPARK_NO_CC=1`` — tests use that to pin byte-parity of
    the pure-Python fallback)."""
    return cext.lib()


def _defilter_avg_py(line: np.ndarray, prev: np.ndarray, c: int) -> np.ndarray:
    """Pure-Python Average defilter (int-list loop, no numpy scalar
    extraction in the hot path)."""
    ll, pl = line.tolist(), prev.tolist()
    out: list = [0] * c
    ap = out.append
    for x, lx in enumerate(ll):
        ap((lx + ((out[x] + pl[x]) >> 1)) & 255)
    return np.asarray(out[c:], dtype=np.uint8)


def _defilter_paeth_py(line: np.ndarray, prev: np.ndarray, c: int) -> np.ndarray:
    """Pure-Python Paeth defilter. Uses the pa=|b-cc| / pb=|a-cc| /
    pc=|a+b-2cc| simplification of the spec's predictor."""
    ll, pl = line.tolist(), prev.tolist()
    plp = [0] * c + pl
    out: list = [0] * c
    ap = out.append
    for x, lx in enumerate(ll):
        a = out[x]
        b = pl[x]
        cc = plp[x]
        pa = b - cc
        if pa < 0:
            pa = -pa
        pb = a - cc
        if pb < 0:
            pb = -pb
        pc = a + b - 2 * cc
        if pc < 0:
            pc = -pc
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
        ap((lx + pred) & 255)
    return np.asarray(out[c:], dtype=np.uint8)


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA
# Hard cap on declared pixel count: bounds every allocation the decoder
# makes against a payload whose header lies (64M pixels covers 8K RGBA).
_MAX_PIXELS = 64 * 1024 * 1024


def _defilter_image(raw: np.ndarray, h: int, stride: int, c: int) -> np.ndarray:
    """(h, stride+1) filterbyte+scanline rows → (h, stride) recon bytes.
    Shared by the sequential and each Adam7-pass decode."""
    filters = raw[:, 0]
    if filters.max(initial=0) > 4:
        bad = int(filters[filters > 4][0])
        raise EngineValueError(f"invalid PNG filter type {bad}.")
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    # Average/Paeth are recursive along x: C row kernel when a compiler
    # exists on this worker, tuned Python-int loop otherwise (identical
    # bytes either way — golden-tested)
    lib = _defilter_lib() if (filters == 3).any() or (filters == 4).any() else None
    for y in range(h):
        ft = filters[y]
        line = raw[y, 1:]
        prev = out[y - 1] if y else zero_row
        if ft == 0:  # None
            out[y] = line
        elif ft == 1:  # Sub: recon[x] = line[x] + recon[x-c] — a running
            # per-channel sum; uint8 accumulate wraps mod 256 exactly
            out[y] = np.add.accumulate(line.reshape(-1, c), axis=0, dtype=np.uint8).reshape(-1)
        elif ft == 2:  # Up
            out[y] = line + prev
        elif lib is not None:  # Average/Paeth, compiled row kernel
            fn = lib.defilter_avg if ft == 3 else lib.defilter_paeth
            fn(
                line.ctypes.data_as(_U8P),
                prev.ctypes.data_as(_U8P),
                out[y].ctypes.data_as(_U8P),
                stride,
                c,
            )
        elif ft == 3:  # Average, Python fallback
            out[y] = _defilter_avg_py(line, prev, c)
        else:  # Paeth, Python fallback
            out[y] = _defilter_paeth_py(line, prev, c)
    return out


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_passes(w: int, h: int, c: int):
    """Yield (x0, y0, xs, ys, pw, ph) for each NON-EMPTY Adam7 pass."""
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw > 0 and ph > 0:
            yield x0, y0, xs, ys, pw, ph


def decode_png(data: bytes) -> np.ndarray:
    """8-bit PNG (gray/RGB/RGBA; sequential or Adam7-interlaced) →
    (H, W[, C]) uint8."""
    if not data.startswith(_PNG_SIG):
        raise EngineValueError("not a PNG payload (missing signature).")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(data):
        size, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            if len(body) != 13:
                raise EngineValueError("truncated PNG IHDR chunk.")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + crc
    if ihdr is None or not idat:
        raise EngineValueError("PNG payload missing IHDR/IDAT chunk.")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS:
        raise EngineValueError(
            f"unsupported PNG format (depth={depth}, color type={color}): "
            "8-bit gray/RGB/RGBA only."
        )
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise EngineValueError("unsupported PNG compression/filter/interlace method.")
    if w == 0 or h == 0:
        raise EngineValueError(f"invalid PNG dimensions {w}x{h}.")
    if w * h > _MAX_PIXELS:
        raise EngineValueError(f"PNG declares {w}x{h} pixels (cap {_MAX_PIXELS}).")
    c = _PNG_CHANNELS[color]
    stride = w * c
    if interlace == 0:
        expected = h * (stride + 1)
    else:
        expected = sum(ph * (pw * c + 1) for _, _, _, _, pw, ph in _adam7_passes(w, h, c))
    # bounded inflate: never allocate more than the declared scanline
    # bytes + 1, so a zlib bomb raises here instead of OOMing the task
    try:
        inflated = zlib.decompressobj().decompress(b"".join(idat), expected + 1)
    except zlib.error as exc:
        raise EngineValueError(f"corrupt PNG pixel stream: {exc}") from None
    if len(inflated) != expected:
        raise EngineValueError("PNG pixel data does not match declared dimensions.")
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if interlace == 0:
        out = _defilter_image(raw.reshape(h, stride + 1), h, stride, c)
        img = out.reshape(h, w, c)
    else:
        # Adam7: each pass is an independently-filtered sub-image,
        # scattered onto its sparse grid (strided assignment — the
        # scatter itself is pure NumPy)
        img = np.zeros((h, w, c), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys, pw, ph in _adam7_passes(w, h, c):
            n = ph * (pw * c + 1)
            sub = raw[off : off + n].reshape(ph, pw * c + 1)
            off += n
            recon = _defilter_image(sub, ph, pw * c, c)
            img[y0::ys, x0::xs] = recon.reshape(ph, pw, c)
    return img[:, :, 0] if c == 1 else img


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _encode_filters(raw: np.ndarray, c: int) -> np.ndarray:
    """All five PNG filter candidates for every scanline at once —
    (5, H, stride) uint8. Encode-side filtering has NO recursion (it
    subtracts ORIGINAL neighbor bytes), so the whole image vectorizes.
    """
    h, stride = raw.shape
    r16 = raw.astype(np.int16)
    left = np.zeros_like(r16)
    left[:, c:] = r16[:, :-c]
    up = np.zeros_like(r16)
    up[1:] = r16[:-1]
    upleft = np.zeros_like(r16)
    upleft[1:, c:] = r16[:-1, :-c]
    p = left + up - upleft
    pa = np.abs(p - left)
    pb = np.abs(p - up)
    pc = np.abs(p - upleft)
    paeth = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
    cands = np.empty((5, h, stride), dtype=np.uint8)
    cands[0] = raw
    cands[1] = (r16 - left).astype(np.uint8)
    cands[2] = (r16 - up).astype(np.uint8)
    cands[3] = (r16 - ((left + up) >> 1)).astype(np.uint8)
    cands[4] = (r16 - paeth).astype(np.uint8)
    return cands


def encode_png(
    arr: np.ndarray, filters: str | list | None = None, interlace: bool = False
) -> bytes:
    """(H, W[, C]) uint8 (gray/RGB/RGBA) → PNG bytes.

    ``interlace=True`` emits Adam7 passes (filter-0 scanlines per
    pass — fixture-grade; ``filters`` applies to the sequential form
    only).

    ``filters``:

    - ``None`` (default): filter-0 scanlines — simple, decodes
      everywhere, keeps existing fixtures byte-stable;
    - ``"adaptive"``: libpng's minimum-sum-of-absolute-differences
      heuristic per scanline (what real encoders emit — mostly
      Average/Paeth rows on photographic content), fully vectorized;
    - a sequence of per-row filter ids in 0..4: forced filters, for
      golden tests that must exercise a specific decode path.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, c = 0, 1
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] in (3, 4):
        color, c = (2, 3) if arr.shape[2] == 3 else (6, 4)
    else:
        raise EngineValueError("encode_png expects (H, W), (H, W, 3) or (H, W, 4) uint8.")
    h, w = arr.shape[:2]
    if interlace:
        if filters is not None:
            raise EngineValueError("interlaced encode supports filter-0 scanlines only.")
        parts = []
        for x0, y0, xs, ys, pw, ph in _adam7_passes(w, h, c):
            sub = arr[y0::ys, x0::xs].reshape(ph, pw * c)
            scan = np.zeros((ph, 1 + pw * c), dtype=np.uint8)
            scan[:, 1:] = sub
            parts.append(scan.tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(parts), 6))
            + _png_chunk(b"IEND", b"")
        )
    raw = arr.reshape(h, w * c)
    scan = np.zeros((h, 1 + w * c), dtype=np.uint8)
    if filters is None:
        scan[:, 1:] = raw
    else:
        cands = _encode_filters(raw, c)
        if isinstance(filters, str):
            if filters != "adaptive":
                raise EngineValueError(f"unknown PNG filter strategy {filters!r}.")
            # MSAD: sum of |signed byte| per candidate row; ties go to
            # the lowest filter id (np.argmin)
            as_signed = cands.astype(np.int16)
            cost = np.minimum(as_signed, 256 - as_signed).sum(axis=2)
            chosen = np.argmin(cost, axis=0)
        else:
            chosen = np.asarray(list(filters), dtype=np.int64)
            if chosen.shape != (h,) or chosen.min(initial=0) < 0 or chosen.max(initial=0) > 4:
                raise EngineValueError("forced PNG filter list must be H ids in 0..4.")
        scan[:, 0] = chosen.astype(np.uint8)
        scan[:, 1:] = cands[chosen, np.arange(h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )
