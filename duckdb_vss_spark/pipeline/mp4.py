"""Pure-stdlib MP4 / ISO-BMFF metadata probe.

The MP4 container (ISO/IEC 14496-12, public) is a tree of
length-prefixed boxes; duration and track geometry live in plain
binary headers (``mvhd``, ``tkhd``) that need no codec library. This
module implements the metadata half of the video path REAL:
``probe_mp4`` walks the box tree and returns duration and visual track
dimensions, so ``sample_frames`` can derive its frame grid from actual
payload bytes. FRAME PIXEL DECODE (H.264/H.265 entropy + transform)
genuinely needs ffmpeg-class machinery and remains the documented
``decoder="real"`` seam.

Scale note: the probe reads only box headers — O(#boxes), no frame
data touched — so it runs happily inside Arrow-batched ``mapInPandas``
over multi-GB payload columns.
"""

from __future__ import annotations

import struct

__all__ = ["probe_mp4", "Mp4Error"]


class Mp4Error(ValueError):
    """Malformed or unsupported MP4 payload."""


# boxes that contain other boxes (the ones on the path to mvhd/tkhd)
_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise Mp4Error("truncated largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise Mp4Error("bad box size")
        yield btype, pos + hdr, pos + size
        pos += size


def probe_mp4(data: bytes) -> dict:
    """MP4 bytes → {duration_ms, width, height, track_count}.

    ``width``/``height`` come from the first visual track (tkhd fixed-
    point 16.16 geometry); ``duration_ms`` from mvhd (movie timescale).
    Raises Mp4Error for non-MP4 bytes or a missing moov."""
    data = bytes(data or b"")
    if len(data) < 12:
        raise Mp4Error("not an MP4 (too short)")
    # first box must be ftyp/styp per spec conventions (accept moov-first
    # too — some muxers front the index for streaming)
    head = data[4:8]
    if head not in (b"ftyp", b"styp", b"moov"):
        raise Mp4Error("not an MP4 (missing ftyp)")

    duration_ms = None
    width = height = None
    track_count = 0

    def walk(start: int, end: int) -> None:
        nonlocal duration_ms, width, height, track_count
        for btype, b0, b1 in _boxes(data, start, end):
            if btype == b"mvhd":
                body = data[b0:b1]
                # version 1 widens creation/modification/duration to 64
                # bits, pushing timescale+duration to bytes [20, 32); a
                # body shorter than its version's field layout must fail
                # as Mp4Error, never escape as struct.error (the probe's
                # documented malformed-payload contract)
                if len(body) < 20:
                    raise Mp4Error("truncated mvhd")
                version = body[0]
                if version == 1:
                    if len(body) < 32:
                        raise Mp4Error("truncated mvhd")
                    timescale, dur = struct.unpack(">IQ", body[20:32])
                else:
                    timescale, dur = struct.unpack(">II", body[12:20])
                if timescale:
                    duration_ms = int(dur * 1000 // timescale)
            elif btype == b"tkhd":
                body = data[b0:b1]
                # need at least version byte + flags + the trailing
                # 8-byte 16.16 width/height this probe reads
                if len(body) < 12:
                    raise Mp4Error("truncated tkhd")
                version = body[0]
                # width/height are the last two 16.16 fields of tkhd
                w_fp, h_fp = struct.unpack(">II", body[-8:])
                w, h = w_fp >> 16, h_fp >> 16
                track_count += 1
                if w and h and width is None:
                    width, height = w, h
            elif btype in _CONTAINERS:
                walk(b0, b1)

    walk(0, len(data))
    if duration_ms is None:
        raise Mp4Error("missing moov/mvhd (no movie header)")
    return {
        "duration_ms": duration_ms,
        "width": width,
        "height": height,
        "track_count": track_count,
    }
