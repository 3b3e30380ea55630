"""Pure-stdlib WAV (RIFF/PCM) codec: the REAL audio codec.

Like the PNG codec (png.py), WAV needs no external library: the format
is a RIFF container with a ``fmt `` chunk describing sample layout and
a ``data`` chunk of raw PCM frames (public spec: RIFF/WAVE, Microsoft/
IBM 1991; format tags 1 = integer PCM, 3 = IEEE float). This module
implements decode (8/16/24/32-bit integer PCM + 32/64-bit float, any
channel count), encode (16-bit PCM), and the frame-energy feature used
by the multimodal pipeline's ``decoder="wav"`` path — so audio rows get
a real decode→feature path instead of a stub.

Scale note: kernels run inside Arrow-batched ``mapInPandas`` workers,
per-clip numpy work — decode is a single ``frombuffer`` view plus a
scale, so throughput is memory-bandwidth-bound.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_wav", "encode_wav", "frame_energy", "WavError"]


class WavError(ValueError):
    """Malformed or unsupported WAV payload."""


# (format_tag, bits) → numpy dtype for the sample words
_INT_FMT = {8: np.uint8, 16: "<i2", 32: "<i4"}
_FLOAT_FMT = {32: "<f4", 64: "<f8"}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float64 in [-1, 1] of shape (n_frames,
    n_channels), sample_rate).

    Supports RIFF/WAVE with integer PCM (tag 1: 8/16/24/32-bit) and
    IEEE float (tag 3: 32/64-bit), any channel count. Raises WavError
    otherwise."""
    data = bytes(data or b"")
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise WavError("truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise WavError("short fmt chunk")
            tag, n_ch, rate, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == 0xFFFE and clen >= 40:  # WAVE_FORMAT_EXTENSIBLE
                (tag,) = struct.unpack("<H", body[24:26])
            fmt = (tag, n_ch, rate, block_align, bits)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    tag, n_ch, rate, _block_align, bits = fmt
    if n_ch < 1:
        raise WavError("zero channels")
    if tag == 1:
        if bits == 24:
            # 24-bit packed: widen each little-endian triplet to int32
            trim = len(pcm) - len(pcm) % 3
            raw = np.frombuffer(pcm[:trim], dtype=np.uint8).reshape(-1, 3)
            ints = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
            samples = ints.astype(np.float64) / float(1 << 23)
        elif bits in _INT_FMT:
            words = np.frombuffer(pcm, dtype=_INT_FMT[bits])
            if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
                samples = (words.astype(np.float64) - 128.0) / 128.0
            else:
                samples = words.astype(np.float64) / float(1 << (bits - 1))
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:
        if bits not in _FLOAT_FMT:
            raise WavError(f"unsupported float bit depth {bits}")
        samples = np.frombuffer(pcm, dtype=_FLOAT_FMT[bits]).astype(np.float64)
    else:
        raise WavError(f"unsupported format tag {tag}")
    frames = len(samples) // n_ch
    return samples[: frames * n_ch].reshape(frames, n_ch), int(rate)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames[, n_channels]) float in [-1, 1] → 16-bit PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise WavError("samples must be 1-D or 2-D")
    n_ch = s.shape[1]
    words = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
    pcm = words.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, int(sample_rate), int(sample_rate) * n_ch * 2, n_ch * 2, 16
    )
    riff_len = 4 + (8 + len(fmt)) + (8 + len(pcm))
    return (
        b"RIFF"
        + struct.pack("<I", riff_len)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def frame_energy(samples: np.ndarray, dim: int) -> np.ndarray:
    """Channel-mean signal → ``dim`` equal frames → per-frame RMS energy,
    peak-normalized to [0, 1] (silent clips stay all-zero). The audio
    analogue of the PNG pixel-grid feature: deterministic, shape-stable,
    no learned model."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = len(mono)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    # pad to a multiple of dim, then one reshape+mean per frame
    frames = -(-n // dim)
    padded = np.zeros(frames * dim, dtype=np.float64)
    padded[:n] = mono
    rms = np.sqrt((padded.reshape(dim, frames) ** 2).mean(axis=1))
    peak = rms.max()
    if peak > 0:
        rms = rms / peak
    return rms.astype(np.float32)
