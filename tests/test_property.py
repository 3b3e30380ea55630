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
