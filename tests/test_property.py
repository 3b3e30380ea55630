"""Property-based tests (hypothesis) for the pure-stdlib codecs.

The example-based tests pin known shapes; these drive arbitrary inputs
through the lossless paths (PNG, WAV encode→decode must be exact; JPEG
is lossy but must roundtrip structurally for any input) so codec edge
cases (1-pixel images, extreme amplitudes, odd dims) can't hide. Pure
numpy — no SparkSession, so this module runs in milliseconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_vss_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
from duckdb_vss_spark.pipeline.png import decode_png, encode_png
from duckdb_vss_spark.pipeline.wav import decode_wav, encode_wav, frame_energy


@st.composite
def _images(draw, max_side=24):
    h = draw(st.integers(1, max_side))
    w = draw(st.integers(1, max_side))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, ch), dtype=np.uint8)


@settings(max_examples=40, deadline=None)
@given(_images())
def test_png_roundtrip_exact(img):
    # PNG is lossless: decode(encode(x)) == x bit-for-bit, any shape
    assert (decode_png(encode_png(img)) == img).all()


@settings(max_examples=40, deadline=None)
@given(_images())
def test_jpeg_roundtrip_structural(img):
    # JPEG is lossy; gray/RGB channel counts must roundtrip shape and
    # stay uint8 for ANY input (incl. 1x1 and noise)
    src = img[:, :, :3] if img.shape[2] >= 3 else img[:, :, :1]
    dec = decode_jpeg(encode_jpeg(src, quality=75))
    assert dec.shape == src.shape
    assert dec.dtype == np.uint8


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 500),
    st.integers(1, 3),
    st.integers(0, 2**32 - 1),
    st.sampled_from([4000, 8000, 44100]),
)
def test_wav_roundtrip_within_quantization(n, ch, seed, rate):
    rng = np.random.default_rng(seed)
    s = rng.uniform(-1, 1, (n, ch))
    dec, r = decode_wav(encode_wav(s, rate))
    assert r == rate and dec.shape == (n, ch)
    # 16-bit quantization: |err| <= 1/32767 plus rounding half-step
    assert np.abs(dec - s).max() <= 1.5 / 32767


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 300), st.integers(1, 32), st.integers(0, 2**32 - 1))
def test_frame_energy_contract(n, dim, seed):
    rng = np.random.default_rng(seed)
    sig = rng.uniform(-1, 1, n)
    e = frame_energy(sig, dim)
    assert e.shape == (dim,) and e.dtype == np.float32
    assert (e >= 0).all() and (e <= 1.0).all()
    if n and np.abs(sig).max() > 0:
        assert e.max() == 1.0  # peak-normalized


# --------------------------------------------------------------------------
# MP4 probe: malformed payloads must raise Mp4Error, never struct.error /
# IndexError (VERDICT r5 #8 / ADVICE r5) — probe_video_metadata only
# catches Mp4Error, so an escaping parser exception would fail a whole
# Spark job on one bad payload.
# --------------------------------------------------------------------------

import struct as _struct  # noqa: E402

from duckdb_vss_spark.pipeline.jpeg import JpegError  # noqa: E402
from duckdb_vss_spark.pipeline.mp4 import Mp4Error, probe_mp4  # noqa: E402


def _box(btype: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return _struct.pack(">I", 1) + btype + _struct.pack(">Q", len(body) + 16) + body
    return _struct.pack(">I", len(body) + 8) + btype + body


@settings(max_examples=120, deadline=None)
@given(
    st.integers(0, 40),
    st.integers(0, 40),
    st.integers(0, 3),
    st.booleans(),
    st.booleans(),
)
def test_probe_mp4_short_header_bodies_raise_mp4error(
    mvhd_len, tkhd_len, version, large_moov, large_trak
):
    """mvhd/tkhd bodies of arbitrary (mostly too-short) lengths inside an
    otherwise valid box tree, under both 32-bit and 64-bit largesize
    containers: probe either succeeds or raises Mp4Error."""
    mvhd_body = bytes([version]) + b"\x00" * mvhd_len
    tkhd_body = bytes([version]) + b"\x00" * tkhd_len
    trak = _box(b"trak", _box(b"tkhd", tkhd_body), large=large_trak)
    moov = _box(b"moov", _box(b"mvhd", mvhd_body) + trak, large=large_moov)
    data = _box(b"ftyp", b"isom\x00\x00\x02\x00") + moov
    try:
        info = probe_mp4(data)
    except Mp4Error:
        return
    assert isinstance(info["duration_ms"], int)


@settings(max_examples=150, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 180))
def test_probe_mp4_truncation_and_bitflips_never_escape(seed, cut):
    """Truncations and random byte corruptions of a valid file: the
    probe returns a dict or raises Mp4Error — nothing else."""
    # a valid container assembled like tests/test_pipeline._mini_mp4
    mvhd = _box(
        b"mvhd",
        b"\x00" * 4 + b"\x00" * 8 + _struct.pack(">II", 1000, 5000) + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07" + b"\x00" * 72 + _struct.pack(">II", 64 << 16, 48 << 16),
    )
    valid = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(
        b"moov", mvhd + _box(b"trak", tkhd)
    )
    rng = np.random.default_rng(seed)
    data = bytearray(valid[: min(cut, len(valid))])
    for _ in range(rng.integers(0, 6)):
        if not data:
            break
        data[rng.integers(0, len(data))] = rng.integers(0, 256)
    try:
        info = probe_mp4(bytes(data))
        assert isinstance(info, dict)
    except Mp4Error:
        pass


def test_jpeg_short_dri_raises_jpegerror():
    """A DRI segment with an empty body (seglen=2) must raise JpegError,
    not struct.error (ADVICE r5)."""
    import pytest

    data = b"\xff\xd8" + b"\xff\xdd\x00\x02" + b"\xff\xd9"
    with pytest.raises(JpegError):
        decode_jpeg(data)


@settings(max_examples=120, deadline=None)
@given(st.integers(0, 2**32 - 1), st.integers(0, 400))
def test_jpeg_truncation_never_escapes(seed, cut):
    """Truncations/corruptions of a valid encode: decode_jpeg either
    returns an image or raises JpegError — the module's documented
    malformed-payload contract."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    valid = bytearray(encode_jpeg(img, quality=80)[: cut if cut else None])
    for _ in range(rng.integers(0, 4)):
        if not valid:
            break
        valid[rng.integers(0, len(valid))] = rng.integers(0, 256)
    try:
        out = decode_jpeg(bytes(valid))
        assert out.dtype == np.uint8
    except JpegError:
        pass


# ---------------------------------------------------------------------------
# AVI / MJPEG container (pipeline/avi.py)

from duckdb_vss_spark.pipeline.avi import (  # noqa: E402
    AviError,
    decode_mjpeg_avi,
    encode_mjpeg_avi,
    probe_avi,
)


@given(
    n=st.integers(min_value=1, max_value=4),
    h=st.integers(min_value=1, max_value=3),
    w=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_avi_container_is_lossless_around_jpeg(n, h, w, seed):
    """The container adds NO loss: decode(avi(frames)) must equal
    decoding each frame's JPEG bytes directly — byte-exact."""
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, (h * 8, w * 8), dtype=np.int64).astype(np.uint8)
        for _ in range(n)
    ]
    avi = encode_mjpeg_avi(frames, fps=10, quality=90)
    got = decode_mjpeg_avi(avi)
    ref = [decode_jpeg(encode_jpeg(f, quality=90)) for f in frames]
    assert len(got) == n
    assert all((a == b).all() for a, b in zip(got, ref))
    p = probe_avi(avi)
    assert p == {"width": w * 8, "height": h * 8, "n_frames": n, "fps": 10}


@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    cut=st.integers(min_value=0, max_value=200),
)
@settings(max_examples=40, deadline=None)
def test_avi_truncation_and_bitflips_never_escape(seed, cut):
    """Truncated/corrupted AVIs raise AviError or JpegError — never
    struct.error/IndexError (the contract that lets a Spark scan drop
    poisoned rows instead of dying)."""
    from duckdb_vss_spark.pipeline.jpeg import JpegError

    rng = np.random.default_rng(seed)
    f = rng.integers(0, 256, (8, 8), dtype=np.int64).astype(np.uint8)
    avi = bytearray(encode_mjpeg_avi([f, f], fps=5))
    avi = avi[: max(0, len(avi) - cut)]
    if avi and seed % 3 == 0:
        avi[seed % len(avi)] ^= 1 << (seed % 8)
    try:
        decode_mjpeg_avi(bytes(avi))
        probe_avi(bytes(avi))
    except (AviError, JpegError):
        pass
