"""Bit-exactness of the vectorized single-block MD5 (pipeline/md5vec).

Every hash in the dedup/minhash family is pinned to DuckDB's md5() for
oracle parity, so md5vec must agree with hashlib on every byte — across
the single-block/multi-block boundary (55/56), empty input, unicode,
and all salt-prefix layouts the MinHash kernel uses.
"""

import hashlib
import random
import string

import numpy as np
import pytest

from duckdb_vss_spark.pipeline.md5vec import MD5_ONE_BLOCK_MAX, md5_u64


def _ref(prefix: bytes, msg: bytes) -> tuple[int, int]:
    dg = hashlib.md5(prefix + msg).digest()
    return int.from_bytes(dg[:8], "big"), int.from_bytes(dg[8:], "big")


def test_every_length_across_block_boundary():
    rng = random.Random(11)
    msgs = [
        bytes(rng.randrange(256) for _ in range(length)) for length in range(0, 81)
    ]
    got = md5_u64(msgs)
    for i, m in enumerate(msgs):
        assert (int(got[0, i, 0]), int(got[0, i, 1])) == _ref(b"", m), len(m)


def test_salted_layout_matches_minhash_kernel_salts():
    rng = random.Random(12)
    msgs = [
        ("".join(rng.choice(string.printable) for _ in range(rng.randrange(60)))).encode()
        for _ in range(200)
    ]
    prefixes = [b""] + [f"{i}_".encode() for i in range(8)]
    got = md5_u64(msgs, prefixes)
    assert got.shape == (9, 200, 2)
    for pi, p in enumerate(prefixes):
        for mi, m in enumerate(msgs):
            assert (int(got[pi, mi, 0]), int(got[pi, mi, 1])) == _ref(p, m)


def test_long_prefix_pushes_short_message_to_fallback():
    # message fits one block alone but not under the longest prefix —
    # the conservative short-mask must route it through hashlib
    msg = b"a" * (MD5_ONE_BLOCK_MAX - 2)
    prefixes = [b"", b"_" * 10]
    got = md5_u64([msg], prefixes)
    for pi, p in enumerate(prefixes):
        assert (int(got[pi, 0, 0]), int(got[pi, 0, 1])) == _ref(p, msg)


def test_unicode_and_empty_batch():
    msgs = ["héllo wörld — ünïcode ✓".encode(), b""]
    got = md5_u64(msgs)
    for i, m in enumerate(msgs):
        assert (int(got[0, i, 0]), int(got[0, i, 1])) == _ref(b"", m)
    empty = md5_u64([])
    assert empty.shape == (1, 0, 2)


def test_mixed_short_long_batch_orders_rows_correctly():
    rng = random.Random(13)
    msgs = []
    for _ in range(300):
        length = rng.choice([3, 20, 54, 55, 56, 200])
        msgs.append(bytes(rng.randrange(256) for _ in range(length)))
    got = md5_u64(msgs, [b"", b"3_"])
    for pi, p in enumerate([b"", b"3_"]):
        for mi, m in enumerate(msgs):
            assert (int(got[pi, mi, 0]), int(got[pi, mi, 1])) == _ref(p, m)


def test_shh_60bit_prefix_matches_sql_oracle_definition():
    # shs[i] oracle form: CAST('0x' || substr(md5(sh),1,15) AS BIGINT)
    # == big-endian first 8 digest bytes >> 4
    msgs = [b"the quick brown", b"fox jumps over"]
    got = md5_u64(msgs)
    for i, m in enumerate(msgs):
        expect = int(hashlib.md5(m).hexdigest()[:15], 16)
        assert int(got[0, i, 0]) >> 4 == expect


def test_output_dtype_is_uint64():
    got = md5_u64([b"x"])
    assert got.dtype == np.uint64


# -- property: agreement with hashlib on arbitrary byte strings -----------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    msgs=st.lists(st.binary(min_size=0, max_size=90), min_size=1, max_size=20),
    prefixes=st.lists(st.binary(min_size=0, max_size=12), min_size=1, max_size=4),
)
def test_property_matches_hashlib(msgs, prefixes):
    got = md5_u64(msgs, prefixes)
    assert got.shape == (len(prefixes), len(msgs), 2)
    for pi, p in enumerate(prefixes):
        for i, m in enumerate(msgs):
            assert (int(got[pi, i, 0]), int(got[pi, i, 1])) == _ref(p, m)
