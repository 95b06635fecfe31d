"""From-scratch baseline JPEG codec — stdlib + NumPy only.

Implements the ITU-T T.81 baseline sequential DCT process, 8-bit,
Huffman-coded (the profile every MJPEG/AVI stream and the vast
majority of web JPEGs use):

- decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS parsing, canonical
  Huffman tables via a 16-bit lookup array, restart-marker handling,
  sampling factors 1-2 in each axis (4:4:4, 4:2:2, 4:2:0), batched
  dequantize + IDCT as batched matmuls per component, nearest-neighbor
  chroma upsampling, BT.601 YCbCr→RGB. Progressive (SOF2), arithmetic
  coding, 12-bit precision, and hierarchical modes raise
  ``EngineValueError`` — honestly unsupported, never mis-decoded.
- encoder (for deterministic fixtures — no external data): quality-
  scaled Annex-K quantization tables, 4:4:4 or 4:2:0, standard
  Annex-K Huffman tables, byte stuffing.

The entropy decode is inherently bit-serial (symbol k+1's position is
unknown until symbol k is decoded). The hot path runs it in the shared
self-compiled C helper (``kernels/cext.py``, ``jpeg_decode_scan`` —
one call per restart segment filling the interleaved coefficient
array); where no compiler exists, a per-symbol Python loop over a flat
65536-entry peek-16 LUT produces identical coefficients
(golden-tested). Everything after the symbol stream — dequant,
de-zigzag, IDCT, upsample, color transform — is vectorized across all
blocks of a component at once. JPEG is lossy: round-trips are asserted
by error bound/PSNR in tests, never bit equality.

All table data is from the public ITU-T T.81 spec (Annex K); the
layout mirrors no existing codebase. Reference parity note: the
datafiller reference has no media path at all (engine-new capability,
SURVEY §2.4 multimodal).
"""

from __future__ import annotations

import struct

import numpy as np

from ..exceptions import EngineValueError
from . import cext as _cext

# hard cap on declared pixel count (same policy as the PNG decoder):
# bounds every allocation against a lying header
_MAX_PIXELS = 64 * 1024 * 1024


def _zigzag_order() -> np.ndarray:
    """Raster index for each zigzag position (generated, not typed —
    the spec's table transcribed by algorithm so it cannot be
    mis-copied)."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag = diag[::-1]
        order.extend(i * 8 + j for i, j in diag)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()

# Annex K quantization tables (luminance / chrominance)
QT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99]
    + [99] * 32,
    dtype=np.int64,
)

# Annex K Huffman table specifications: (BITS counts per code length
# 1..16, HUFFVAL symbol list)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
for _bits, _vals in (
    (DC_LUM_BITS, DC_LUM_VALS),
    (DC_CHROM_BITS, DC_CHROM_VALS),
    (AC_LUM_BITS, AC_LUM_VALS),
    (AC_CHROM_BITS, AC_CHROM_VALS),
):
    assert sum(_bits) == len(_vals), "Annex K table transcription error"


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: FDCT = D @ B @ D.T,
    IDCT = D.T @ X @ D."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    d[0] /= np.sqrt(2.0)
    return d


_DCT8 = _dct_matrix()


# ----------------------------------------------------------- Huffman


def _canonical_codes(bits: list, vals: list) -> dict:
    """symbol → (code, length) for the canonical code the spec's
    (BITS, HUFFVAL) pair defines."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_LUT_CACHE: dict = {}


def _decode_lut(bits: list, vals: list) -> tuple:
    """65536-entry (symbol, length) lookup: index with the next 16 bits
    of the stream, read length, consume. Baseline codes are ≤16 bits so
    one peek always suffices. Returns (sym_list, len_list, sym_int16,
    len_uint8) — the list forms for the Python fallback, the NumPy
    forms for the C scan decoder. Cached by table content: building the
    64K tables costs ~5 ms, and every frame of an MJPEG stream (and
    virtually every JPEG in a corpus) reuses the standard Annex-K
    tables, so per-decode rebuild was the dominant cost on small
    frames."""
    key = (bytes(bits), bytes(vals))
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = [-1] * 65536
    ln = [0] * 65536
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise EngineValueError("invalid JPEG Huffman table (code overflow).")
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            sym[lo:hi] = [vals[k]] * (hi - lo)
            ln[lo:hi] = [length] * (hi - lo)
            code += 1
            k += 1
        code <<= 1
    out = (sym, ln, np.asarray(sym, dtype=np.int16), np.asarray(ln, dtype=np.uint8))
    if len(_LUT_CACHE) >= 64:  # bound against hostile many-table streams
        _LUT_CACHE.clear()
    _LUT_CACHE[key] = out
    return out


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits", "overrun")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self.overrun = 0

    def _fill16(self) -> None:
        data, pos = self.data, self.pos
        while self.nbits < 16:
            if pos < len(data):
                self.acc = (self.acc << 8) | data[pos]
                pos += 1
            else:
                # spec: pad with 1-bits past the end (a final EOB may
                # need them); real overrun is caught by the caller
                self.acc = (self.acc << 8) | 0xFF
                self.overrun += 8
            self.nbits += 8
        self.pos = pos

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill16()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill16()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v


def _extend(v: int, size: int) -> int:
    """Sign-extend a JPEG magnitude field."""
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


# ----------------------------------------------------------- decoder


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W) uint8 (grayscale) or (H, W, 3) uint8 RGB."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise EngineValueError("not a JPEG payload (missing SOI marker).")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, tuple] = {}
    huff_ac: dict[int, tuple] = {}
    sof = None
    restart_interval = 0
    scan = None
    comps_sos: list = []

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise EngineValueError(f"corrupt JPEG marker stream at byte {pos}.")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # RSTn outside a scan
            raise EngineValueError("restart marker outside entropy data.")
        if pos + 2 > len(data):
            raise EngineValueError("truncated JPEG segment header.")
        seg_len = struct.unpack_from(">H", data, pos)[0]
        if seg_len < 2 or pos + seg_len > len(data):
            raise EngineValueError("truncated JPEG segment.")
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise EngineValueError("16-bit JPEG quant tables unsupported.")
                if b + 65 > len(body):
                    raise EngineValueError("truncated DQT segment.")
                qt[tq] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8).astype(np.int64)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b + 17 <= len(body):
                tc, th = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                if b + 17 + n > len(body):
                    raise EngineValueError("truncated DHT segment.")
                vals = list(body[b + 17 : b + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_lut(bits, vals)
                b += 17 + n
            if b != len(body):
                # 1-16 trailing bytes can't be a table header; stay
                # consistent with the strict truncation policy above
                raise EngineValueError("trailing garbage in JPEG DHT segment.")
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline/ext sequential
            if len(body) < 6:
                raise EngineValueError("truncated SOF segment.")
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise EngineValueError(f"unsupported JPEG precision {prec} (8-bit only).")
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                raise EngineValueError(f"invalid JPEG dimensions {w}x{h}.")
            if nc not in (1, 3):
                raise EngineValueError(f"unsupported JPEG component count {nc}.")
            if len(body) < 6 + 3 * nc:
                raise EngineValueError("truncated SOF segment.")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = hv >> 4, hv & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise EngineValueError(f"unsupported sampling factors {hs}x{vs}.")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
            sof = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise EngineValueError(
                "unsupported JPEG process (progressive/arithmetic/lossless): "
                "baseline sequential Huffman only."
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise EngineValueError("truncated DRI segment.")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise EngineValueError("JPEG SOS before SOF.")
            if not body:
                raise EngineValueError("truncated SOS segment.")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise EngineValueError("truncated SOS segment.")
            comps_sos = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comps_sos.append({"id": cs, "td": tt >> 4, "ta": tt & 0x0F})
            # find the end of the entropy segment: next marker that is
            # not RSTn or a stuffed 0xFF00
            end = pos
            found_marker = False
            while end + 1 < len(data):
                if data[end] == 0xFF and data[end + 1] != 0x00 and not (
                    0xD0 <= data[end + 1] <= 0xD7
                ):
                    found_marker = True
                    break
                end += 1
            if not found_marker:
                # EOI-truncated file: the final byte is entropy data,
                # not the start of a marker — include it
                end = len(data)
            scan = data[pos:end]
            pos = end
            break  # single-scan baseline: decode below
        # else: APPn/COM/DNL etc. — skipped

    if sof is None or scan is None:
        raise EngineValueError("JPEG payload missing SOF/SOS.")

    comps = sof["comps"]
    w, h = sof["w"], sof["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    n_mcus = mcus_x * mcus_y

    by_id = {c["id"]: c for c in comps}
    order = []
    seen_ids = set()
    for sc in comps_sos:
        if sc["id"] not in by_id:
            raise EngineValueError("JPEG SOS references unknown component.")
        if sc["id"] in seen_ids:
            # len(order) == len(comps) alone would pass a corrupt scan
            # header listing one component twice, producing a wrong MCU
            # slot layout and garbage pixels instead of a clear error
            raise EngineValueError("JPEG SOS lists a component twice.")
        seen_ids.add(sc["id"])
        c = by_id[sc["id"]]
        if c["tq"] not in qt:
            raise EngineValueError("JPEG component references missing quant table.")
        if sc["td"] not in huff_dc or sc["ta"] not in huff_ac:
            raise EngineValueError("JPEG scan references missing Huffman table.")
        order.append(
            {
                "h": c["h"],
                "v": c["v"],
                "qt": qt[c["tq"]],
                "dc": huff_dc[sc["td"]],
                "ac": huff_ac[sc["ta"]],
            }
        )
    if len(order) != len(comps):
        raise EngineValueError("JPEG scan does not cover all frame components.")

    # MCU block-slot layout shared by the C and Python decoders: slots
    # run component-major (comp 0's v*h blocks, then comp 1's, ...) —
    # the spec's interleave order. Coefficients land in one interleaved
    # (n_mcus * blocks_per_mcu, 64) zigzag array; dequant/de-zigzag/
    # IDCT are vectorized afterwards.
    bpm = sum(c["h"] * c["v"] for c in order)
    slot_dc, slot_ac, slot_comp = [], [], []
    for ci, c in enumerate(order):
        for _ in range(c["h"] * c["v"]):
            slot_dc.append(c["dc"])
            slot_ac.append(c["ac"])
            slot_comp.append(ci)
    all_coef = np.zeros((n_mcus * bpm, 64), dtype=np.int32)

    # split entropy data at restart markers, unstuff each segment
    segments = []
    seg_start, i = 0, 0
    while i + 1 < len(scan):
        if scan[i] == 0xFF and 0xD0 <= scan[i + 1] <= 0xD7:
            segments.append(scan[seg_start:i])
            seg_start = i + 2
            i += 2
        else:
            i += 1
    segments.append(scan[seg_start:])
    segments = [s.replace(b"\xff\x00", b"\xff") for s in segments]

    lib = _cext.lib()
    if lib is not None:
        # stack the peek-16 LUTs once (int16 symbol / uint8 length per
        # table), map each slot to its stack index
        tab_ids: dict[int, int] = {}
        stacks_sym, stacks_len = [], []

        def _tab_index(lut) -> int:
            key = id(lut)
            if key not in tab_ids:
                tab_ids[key] = len(stacks_sym)
                stacks_sym.append(lut[2])  # cached int16 form
                stacks_len.append(lut[3])  # cached uint8 form
            return tab_ids[key]

        blk_dc = np.array([_tab_index(t) for t in slot_dc], dtype=np.uint8)
        blk_ac = np.array([_tab_index(t) for t in slot_ac], dtype=np.uint8)
        blk_comp = np.array(slot_comp, dtype=np.uint8)
        syms = np.ascontiguousarray(np.stack(stacks_sym).reshape(-1))
        lens = np.ascontiguousarray(np.stack(stacks_len).reshape(-1))

    _ERRS = {
        -1: "corrupt JPEG entropy data (bad DC code).",
        -2: "corrupt JPEG entropy data (bad AC code).",
        -3: "corrupt JPEG entropy data (AC overrun).",
    }
    mcus_per_seg = restart_interval if restart_interval else n_mcus
    mcu_idx = 0
    for seg in segments:
        if mcu_idx >= n_mcus:
            break
        seg_mcus = min(mcus_per_seg, n_mcus - mcu_idx)
        if lib is not None:
            seg_arr = np.frombuffer(seg, dtype=np.uint8)
            preds = np.zeros(len(order), dtype=np.int64)
            ret = lib.jpeg_decode_scan(
                seg_arr.ctypes.data_as(_cext.U8P) if len(seg_arr) else _cext.U8P(),
                len(seg_arr),
                syms.ctypes.data_as(_cext.I16P),
                lens.ctypes.data_as(_cext.U8P),
                blk_dc.ctypes.data_as(_cext.U8P),
                blk_ac.ctypes.data_as(_cext.U8P),
                blk_comp.ctypes.data_as(_cext.U8P),
                bpm,
                seg_mcus,
                all_coef[mcu_idx * bpm :].ctypes.data_as(_cext.I32P),
                preds.ctypes.data_as(_cext.I64P),
            )
            if ret < 0:
                raise EngineValueError(_ERRS[int(ret)])
            overrun = int(ret)
            mcu_idx += seg_mcus
        else:
            reader = _BitReader(seg)
            preds_py = [0] * len(order)  # DC predictors reset per restart
            for _ in range(seg_mcus):
                base = mcu_idx * bpm
                for s_no in range(bpm):
                    dc_sym, dc_len = slot_dc[s_no][0], slot_dc[s_no][1]
                    ac_sym, ac_len = slot_ac[s_no][0], slot_ac[s_no][1]
                    ci = slot_comp[s_no]
                    blk = all_coef[base + s_no]
                    # DC (baseline 8-bit magnitude categories are 0..11;
                    # a hostile DHT can smuggle larger symbols, which
                    # would over-shift the bit reader)
                    v16 = reader.peek16()
                    s = dc_sym[v16]
                    if s < 0 or s > 11:
                        raise EngineValueError(_ERRS[-1])
                    reader.skip(dc_len[v16])
                    if s:
                        preds_py[ci] += _extend(reader.read(s), s)
                    blk[0] = preds_py[ci]
                    # AC
                    k = 1
                    while k < 64:
                        v16 = reader.peek16()
                        s = ac_sym[v16]
                        if s < 0:
                            raise EngineValueError(_ERRS[-2])
                        reader.skip(ac_len[v16])
                        r, size = s >> 4, s & 0x0F
                        if size == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise EngineValueError(_ERRS[-3])
                        blk[k] = _extend(reader.read(size), size)
                        k += 1
                mcu_idx += 1
            overrun = reader.overrun
        # a valid final peek can prefetch up to ~24 pad bits; anything
        # beyond that means the stream ran dry mid-MCU
        if overrun > 32:
            raise EngineValueError("truncated JPEG entropy data.")
    if mcu_idx < n_mcus:
        raise EngineValueError("truncated JPEG entropy data (missing MCUs).")

    # reconstruct each component plane: batched dequant + IDCT
    planes = []
    slot_start = 0
    coef_3d = all_coef.reshape(n_mcus, bpm, 64)
    for c in order:
        n_slots = c["h"] * c["v"]
        comp_coef = coef_3d[:, slot_start : slot_start + n_slots, :].reshape(-1, 64)
        slot_start += n_slots
        coef = comp_coef.astype(np.float64) * c["qt"][None, :]
        blocks = np.zeros((coef.shape[0], 64), dtype=np.float64)
        blocks[:, ZIGZAG] = coef
        blocks = blocks.reshape(-1, 8, 8)
        # batched IDCT as two broadcast matmuls (BLAS path; ~3x einsum)
        pix = (_DCT8.T @ blocks) @ _DCT8 + 128.0
        # block order is MCU-major: (mcu, v, h); scatter into the plane
        bh, bw = c["v"], c["h"]
        grid = pix.reshape(mcus_y, mcus_x, bh, bw, 8, 8)
        plane = grid.transpose(0, 2, 4, 1, 3, 5).reshape(mcus_y * bh * 8, mcus_x * bw * 8)
        # upsample to full MCU-padded resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=2
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ----------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _quality_scale(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality→table scaling (public formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int64)


def _quantize_plane(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shifted (H8, W8) plane (multiple of 8) → quantized zigzag
    coefficient rows (n_blocks, 64) in raster block order. FDCT and
    quantization vectorize across every block of the plane at once."""
    ph, pw = plane.shape
    blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    freq = ((_DCT8 @ blocks) @ _DCT8.T).reshape(-1, 64)
    q = np.round(freq / qtab[None, :]).astype(np.int64)
    return q[:, ZIGZAG]  # zig[z] = raster[ZIGZAG[z]]


def _emit_block(row: np.ndarray, dc_codes: dict, ac_codes: dict, bw: "_BitWriter", pred: int) -> int:
    """Huffman-encode one quantized zigzag row; returns the new DC
    predictor (entropy coding is serial — this is the only per-
    coefficient Python in the encoder)."""
    diff = int(row[0]) - pred
    pred = int(row[0])
    size = diff.bit_length() if diff > 0 else (-diff).bit_length()
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bw.write(amp, size)
    run = 0
    nz = np.nonzero(row[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = v.bit_length() if v > 0 else (-v).bit_length()
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        amp = v if v > 0 else v + (1 << size) - 1
        bw.write(amp, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return pred


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W) or (H, W, 3) uint8 → baseline JFIF JPEG bytes.

    ``subsampling``: '444' (no chroma subsampling), '422' (2x1
    horizontal) or '420' (2x2 — what real MJPEG streams use).
    Grayscale input ignores it.
    ``restart_interval``: emit a DRI segment and RSTn markers every N
    MCUs (0 = none) — the resync mechanism MJPEG streams use.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
        raise EngineValueError("encode_jpeg expects (H, W) or (H, W, 3) uint8.")
    if subsampling not in ("444", "422", "420"):
        raise EngineValueError(f"unsupported subsampling {subsampling!r} (444/422/420).")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise EngineValueError("encode_jpeg: empty image.")
    gray = arr.ndim == 2
    qy = _quality_scale(QT_LUM, quality)
    qc = _quality_scale(QT_CHROM, quality)
    dc_l = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_l = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_c = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_c = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    if gray:
        comps = [(1, 1, 1, 0)]  # id, h, v, tq
    elif subsampling == "444":
        comps = [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    elif subsampling == "422":
        comps = [(1, 2, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    else:
        comps = [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # color transform + edge-replicate pad to MCU multiples
    f = arr.astype(np.float64)
    if gray:
        planes = [f]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    padded = []
    for plane, (cid, ch, cv, tq) in zip(planes, comps):
        if not gray and (ch, cv) != (hmax, vmax):
            # chroma subsample by block averaging (2x2)
            sh, sv = hmax // ch, vmax // cv
            ph = (plane.shape[0] + sv - 1) // sv * sv
            pw = (plane.shape[1] + sh - 1) // sh * sh
            tmp = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), "edge")
            plane = tmp.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        target_h, target_w = mcus_y * cv * 8, mcus_x * ch * 8
        plane = np.pad(
            plane,
            ((0, target_h - plane.shape[0]), (0, target_w - plane.shape[1])),
            "edge",
        )
        padded.append(plane - 128.0)

    # FDCT + quantize every block of every component in one shot, then
    # stream the symbols in MCU-interleaved order
    qrows = [
        _quantize_plane(padded[ci], qy if tq == 0 else qc)
        for ci, (cid, ch, cv, tq) in enumerate(comps)
    ]
    bw = _BitWriter()
    entropy = bytearray()
    preds = [0] * len(comps)
    mcu_no, rst_no = 0, 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                entropy += bw.flush()
                entropy += bytes([0xFF, 0xD0 + rst_no])
                rst_no = (rst_no + 1) & 7
                bw = _BitWriter()
                preds = [0] * len(comps)
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                rows = qrows[ci]
                stride = mcus_x * ch  # blocks per block-row of this comp
                dc = dc_l if tq == 0 else dc_c
                ac = ac_l if tq == 0 else ac_c
                for by in range(cv):
                    base = (my * cv + by) * stride + mx * ch
                    for bxi in range(ch):
                        preds[ci] = _emit_block(rows[base + bxi], dc, ac, bw, preds[ci])
            mcu_no += 1
    entropy += bw.flush()
    entropy = bytes(entropy)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    # DQT payloads are zigzag-ordered per the spec
    out += seg(0xDB, bytes([0x00]) + bytes(qy[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].astype(np.uint8)))
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, ch, cv, tq in comps:
        sof += bytes([cid, (ch << 4) | cv, tq])
    out += seg(0xC0, bytes(sof))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC4, bytes([0x00] + DC_LUM_BITS) + bytes(DC_LUM_VALS))
    out += seg(0xC4, bytes([0x10] + AC_LUM_BITS) + bytes(AC_LUM_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01] + DC_CHROM_BITS) + bytes(DC_CHROM_VALS))
        out += seg(0xC4, bytes([0x11] + AC_CHROM_BITS) + bytes(AC_CHROM_VALS))
    sos = bytearray([len(comps)])
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += b"\x00\x3f\x00"  # Ss=0, Se=63, Ah/Al=0
    out += seg(0xDA, bytes(sos))
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)
