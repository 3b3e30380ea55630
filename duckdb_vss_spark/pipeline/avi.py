"""Pure-stdlib AVI (RIFF) MJPEG video codec: REAL video frame decode.

Motion-JPEG stores every video frame as an independent baseline JPEG
inside a RIFF/AVI container (public specs: RIFF/AVI, Microsoft 1992;
OpenDML AVI; frames per ITU-T T.81). Since this repo already has a
from-scratch baseline JPEG codec (jpeg.py) and RIFF walking (wav.py),
MJPEG needs only the container: a ``hdrl`` LIST with the main +
stream headers and a ``movi`` LIST whose ``00dc`` chunks are the raw
JPEG bytes of each frame.

This makes VIDEO FRAME PIXEL DECODE real for the MJPEG profile — the
remaining ffmpeg seam (multimodal.py ``decoder="real"``) now covers
only inter-frame entropy-coded codecs (H.264/H.265/VP9/AV1), whose
arithmetic/CABAC decode genuinely needs codec libraries absent here.

Scale note: like the other codecs, all kernels run inside
Arrow-batched ``mapInPandas`` workers; an AVI decodes frame-by-frame
with O(frame) memory, and only derived values (dims, sampled pixels,
features) leave the worker — payload bytes never shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

from duckdb_vss_spark.pipeline.jpeg import JpegError, decode_jpeg, encode_jpeg

__all__ = ["encode_mjpeg_avi", "decode_mjpeg_avi", "probe_avi", "AviError"]


class AviError(ValueError):
    """Malformed or unsupported AVI payload."""


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(listtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", listtype + body)


def encode_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90
) -> bytes:
    """Grayscale/RGB uint8 frames → MJPEG AVI bytes.

    All frames must share one shape; each is independently encoded as
    a baseline JPEG (``00dc`` = compressed video chunk)."""
    if not frames:
        raise AviError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise AviError("all frames must share one shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(1, fps),  # dwMicroSecPerFrame
        max_sz * fps,              # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags (AVIF_HASINDEX unset; 0x10=WASCAPTUREFILE-ish ok)
        n,                         # dwTotalFrames
        0, 1,                      # dwInitialFrames, dwStreams
        max_sz,                    # dwSuggestedBufferSize
        w, h,
        0, 0, 0, 0,                # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, n, max_sz, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    # BITMAPINFOHEADER, biCompression = 'MJPG'
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for chunks in [pos, end)."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        start = pos + 8
        if start + size > end:
            raise AviError("truncated chunk")
        yield fourcc, start, size
        pos = start + size + (size % 2)


def _movi_bounds(data: bytes) -> tuple[int, int]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    for fourcc, start, size in _walk(data, 12, end):
        if fourcc == b"LIST" and data[start : start + 4] == b"movi":
            return start + 4, start + size
    raise AviError("no movi list")


def decode_mjpeg_avi(data: bytes) -> list[np.ndarray]:
    """AVI bytes → list of decoded frames (uint8 arrays), via the
    repo's own baseline JPEG decoder. Raises AviError for container
    damage and JpegError for frame damage."""
    data = bytes(data or b"")
    lo, hi = _movi_bounds(data)
    frames = []
    for fourcc, start, size in _walk(data, lo, hi):
        if fourcc[2:] in (b"dc", b"db"):
            frames.append(decode_jpeg(data[start : start + size]))
    if not frames:
        raise AviError("movi list holds no video chunks")
    return frames


def probe_avi(data: bytes) -> dict:
    """AVI bytes → {width, height, n_frames, fps} from the avih main
    header (no frame decode). Raises AviError if malformed."""
    data = bytes(data or b"")
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not an AVI (missing RIFF/AVI header)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)
    for fourcc, start, size in _walk(data, 12, end):
        if fourcc == b"LIST" and data[start : start + 4] == b"hdrl":
            for f2, s2, z2 in _walk(data, start + 4, start + size):
                if f2 == b"avih":
                    if z2 < 40:
                        raise AviError("truncated avih")
                    vals = struct.unpack("<10I", data[s2 : s2 + 40])
                    usec = vals[0]
                    return {
                        "width": int(vals[8]),
                        "height": int(vals[9]),
                        "n_frames": int(vals[4]),
                        "fps": int(round(1_000_000 / usec)) if usec else 0,
                    }
            raise AviError("hdrl holds no avih")
    raise AviError("no hdrl list")
