"""MJPEG-in-AVI container — stdlib only, JPEG frames via kernels/jpeg.

The one video format decodable with no codec library: an AVI (RIFF)
container whose video stream is a sequence of independent baseline
JPEG frames ('MJPG'). Together with ``kernels/jpeg.py`` this retires
the multimodal operator's video ``NotImplementedError`` for the MJPEG
case; other codecs (H.264 etc.) still raise honestly.

- ``demux_avi(data)``: walk the RIFF tree, return the 'movi' list's
  video chunks ('00dc'/'00db') as raw JPEG byte strings plus the fps
  from the 'strh' header. Tolerant of missing idx1; bounded (frame
  count cap, size validation) against hostile payloads.
- ``mux_avi(frames, fps, w, h)``: minimal spec-correct writer used to
  synthesize deterministic fixtures (avih + strl/strh/strf + movi +
  idx1) — VLC/ffprobe-compatible layout, no external data needed.

Reference parity note: the datafiller reference has no media path
(engine-new capability, SURVEY §2.4 multimodal).
"""

from __future__ import annotations

import struct

from ..exceptions import EngineValueError

_MAX_FRAMES = 100_000  # bound against a hostile header


def is_avi(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI "


def demux_avi(data: bytes) -> tuple[list[bytes], float, list[int]]:
    """AVI bytes → (JPEG frame payloads, frames_per_second, byte offset
    of each frame's chunk body within ``data``).

    Only the FIRST 'vids' stream's '##dc'/'##db' chunks are returned —
    the chunk id's two-digit prefix must match that stream's index in
    strh declaration order — so a multi-stream AVI (audio, text, or a
    second video stream) cannot interleave foreign frames into the
    sequence or pair them with the wrong fps. fps comes from that same
    strh (rate/scale); when no 'vids' strh exists at all, any dc/db
    chunk is accepted (headerless tolerance) at the default 25.0 fps.
    """
    if not is_avi(data):
        raise EngineValueError("not an AVI payload (missing RIFF/AVI magic).")
    fps = 25.0
    frames: list[bytes] = []
    offsets: list[int] = []
    stream_count = 0
    vid_stream: int | None = None

    # TWO passes over the RIFF tree: headers first, frames second. A
    # single pass would leave vid_stream undetermined while walking a
    # 'movi' LIST that precedes 'hdrl' (hostile/malformed ordering), and
    # the headerless-tolerance branch would then accept every stream's
    # chunks — exactly the foreign-frame interleaving the pinning is
    # for. The header pass only touches chunk ids/sizes, never frame
    # bytes, so the extra walk is a few hundred comparisons.
    def walk(pos: int, end: int, in_movi: bool, depth: int, headers: bool) -> None:
        nonlocal fps, stream_count, vid_stream
        if depth > 16:  # real AVIs nest ~3 deep; bound hostile nesting
            raise EngineValueError("AVI LIST nesting too deep.")
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack_from("<I", data, pos + 4)[0]
            body_start = pos + 8
            body_end = body_start + size
            if body_end > end:
                raise EngineValueError("truncated AVI chunk (size exceeds container).")
            if cid == b"LIST":
                if size < 4:
                    raise EngineValueError("truncated AVI LIST chunk.")
                ltype = data[body_start : body_start + 4]
                walk(
                    body_start + 4,
                    body_end,
                    in_movi or ltype == b"movi",
                    depth + 1,
                    headers,
                )
            elif cid == b"strh":
                if headers:
                    # stream id = position in strh declaration order
                    this_stream = stream_count
                    stream_count += 1
                    if (
                        vid_stream is None
                        and size >= 32
                        and data[body_start : body_start + 4] == b"vids"
                    ):
                        vid_stream = this_stream
                        scale, rate = struct.unpack_from("<II", data, body_start + 20)
                        if scale and rate:
                            fps = rate / scale
            elif (
                not headers
                and in_movi
                and len(cid) == 4
                and cid[2:4] in (b"dc", b"db")
            ):
                if vid_stream is not None and cid[:2] != b"%02d" % vid_stream:
                    pos = body_end + (size & 1)
                    continue  # another stream's chunk: not our video
                if len(frames) >= _MAX_FRAMES:
                    raise EngineValueError(f"AVI declares more than {_MAX_FRAMES} frames.")
                frames.append(data[body_start:body_end])
                offsets.append(body_start)
            pos = body_end + (size & 1)  # chunks are word-aligned

    declared = struct.unpack_from("<I", data, 4)[0]
    span = min(8 + declared, len(data))
    walk(12, span, False, 0, True)
    walk(12, span, False, 0, False)
    return frames, fps, offsets


def mux_avi(frames: list[bytes], fps: int, width: int, height: int) -> bytes:
    """JPEG frame payloads → minimal MJPG AVI bytes (one video stream)."""
    if not frames:
        raise EngineValueError("mux_avi needs at least one frame.")
    if fps <= 0:
        raise EngineValueError("mux_avi needs fps > 0.")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        max_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n,  # total frames
        0,  # initial frames
        1,  # streams
        max_bytes,  # suggested buffer size
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            1,  # scale
            fps,  # rate (fps = rate/scale)
            0,  # start
            n,  # length in frames
            max_bytes,  # suggested buffer size
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (0 = varying)
            0,  # rcFrame (2x2 int16 packed as one u32 pair below)
        )
        + struct.pack("<HH", width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, struct.unpack("<I", b"MJPG")[0],
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray(b"movi")
    offsets = []
    for f in frames:
        offsets.append(len(movi_body))  # offset of the chunk within movi
        movi_body += chunk(b"00dc", f)
    movi = chunk(b"LIST", bytes(movi_body))

    idx = bytearray()
    for off, f in zip(offsets, frames):
        # AVIOLDINDEX offsets are relative to the 'movi' fourcc
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    idx1 = chunk(b"idx1", bytes(idx))

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_video(data: bytes, frame_indices=None) -> tuple[list, float]:
    """MJPEG/AVI bytes → (list of decoded (H, W[, 3]) uint8 frames,
    fps). ``frame_indices`` limits decode to those frame numbers, in
    the REQUESTED order (out-of-range indices are dropped, duplicates
    honored — result[k] pairs with the k-th valid requested index);
    container demux still walks all chunk headers, so skipping is
    O(bytes scanned), not O(frames) JPEG decodes."""
    from .jpeg import decode_jpeg

    payloads, fps, _offsets = demux_avi(data)
    if not payloads:
        raise EngineValueError("AVI payload contains no video frames.")
    if frame_indices is not None:
        payloads = [payloads[i] for i in frame_indices if 0 <= i < len(payloads)]
    return [decode_jpeg(p) for p in payloads], fps


def first_frame(data: bytes) -> tuple:
    """MJPEG/AVI bytes → (first decoded frame, n_frames, fps) — the
    one-decode container probe the Spark scan stages share (metadata +
    thumbnail paths must never decode every frame)."""
    from .jpeg import decode_jpeg

    payloads, fps, _offsets = demux_avi(data)
    if not payloads:
        raise EngineValueError("AVI payload contains no video frames.")
    return decode_jpeg(payloads[0]), len(payloads), fps
