"""Vectorized single-block MD5 over numpy (RFC 1321).

The shingle/minhash kernels (``dedup.doc_shingles``) need md5 — not a
cheaper hash — because every hash value is pinned to DuckDB's ``md5()``
for cross-engine oracle parity (dedup.py module docstring). Profiling
(r10) put the hashlib loop at ~0.9 µs per unique shingle for the
unsalted pass and ~16 µs with 8 salted MinHash digests — the dominant
cost of the minhash/contamination map side. Real-corpus shingles are
short (word 3-grams: p99 ≈ 21 bytes): messages up to 55 bytes pad into
a SINGLE 64-byte MD5 block, so the whole digest is one 64-step
compression — expressible as ~500 numpy uint32 vector ops over ALL
messages at once instead of a Python loop.

``md5_u64`` hashes a batch of short byte strings (optionally under P
salt prefixes, stacked into ONE compression pass of P·N rows) and
returns the digest as two big-endian uint64 halves — exactly the
``int.from_bytes(digest[:8]/[8:], "big")`` values the MinHash kernel
compares. Messages longer than the single-block limit fall back to
hashlib row-wise (rare by construction; correctness identical).

Bit-exactness vs ``hashlib.md5`` is pinned by tests/test_md5vec.py
across lengths 0..80 (crossing the 55/56 single-block boundary),
unicode, and all salt layouts.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["MD5_ONE_BLOCK_MAX", "md5_u64"]

# longest message that still pads into one 64-byte block:
# len + 1 (0x80 pad byte) + 8 (bit-length field) <= 64
MD5_ONE_BLOCK_MAX = 55

# RFC 1321 per-step constants: K[i] = floor(2^32 * |sin(i+1)|) ...
_K = np.array(
    [int(abs(np.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
# ... per-step left-rotation amounts ...
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
# ... and the message-word schedule g(i) for the four rounds
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _compress(blocks: np.ndarray) -> np.ndarray:
    """One MD5 compression over N pre-padded 64-byte blocks.

    ``blocks``: (N, 64) uint8. Returns (N, 2) uint64 — the digest's
    big-endian (hi, lo) 8-byte halves. All arithmetic is uint32 with
    natural wraparound (numpy unsigned overflow wraps silently).
    """
    n = len(blocks)
    m = blocks.view("<u4").reshape(n, 16)
    a = np.full(n, _INIT[0], dtype=np.uint32)
    b = np.full(n, _INIT[1], dtype=np.uint32)
    c = np.full(n, _INIT[2], dtype=np.uint32)
    d = np.full(n, _INIT[3], dtype=np.uint32)
    # two scratch buffers; every step works in-place in f/x — the loop
    # allocates nothing (profiled: temporaries were ~half the runtime)
    f = np.empty(n, dtype=np.uint32)
    x = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:
            # (b & c) | (~b & d)  ==  d ^ (b & (c ^ d))
            np.bitwise_xor(c, d, out=f)
            np.bitwise_and(f, b, out=f)
            np.bitwise_xor(f, d, out=f)
        elif i < 32:
            # (d & b) | (~d & c)  ==  c ^ (d & (b ^ c))
            np.bitwise_xor(b, c, out=f)
            np.bitwise_and(f, d, out=f)
            np.bitwise_xor(f, c, out=f)
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
        else:
            # c ^ (b | ~d)
            np.bitwise_not(d, out=f)
            np.bitwise_or(f, b, out=f)
            np.bitwise_xor(f, c, out=f)
        np.add(f, a, out=x)
        x += np.uint32(int(_K[i]))
        x += m[:, _G[i]]
        s = int(_S[i])
        np.left_shift(x, np.uint32(s), out=f)
        x >>= np.uint32(32 - s)
        f |= x
        f += b
        a, d, c, b, f = d, c, b, f, a
    a += np.uint32(_INIT[0])
    b += np.uint32(_INIT[1])
    c += np.uint32(_INIT[2])
    d += np.uint32(_INIT[3])
    # digest bytes = a,b,c,d little-endian; int.from_bytes(digest[:8],
    # "big") therefore byteswaps each word: hi = bswap(a)<<32|bswap(b)
    hi = (a.byteswap().astype(np.uint64) << np.uint64(32)) | b.byteswap().astype(
        np.uint64
    )
    lo = (c.byteswap().astype(np.uint64) << np.uint64(32)) | d.byteswap().astype(
        np.uint64
    )
    return np.stack([hi, lo], axis=1)


def md5_u64(msgs: list[bytes], prefixes: list[bytes] | None = None) -> np.ndarray:
    """md5 of ``prefix + msg`` for every (prefix, msg) pair.

    Returns (P, N, 2) uint64 — digest big-endian (hi, lo) halves —
    where P = len(prefixes) (or 1 for ``prefixes=None``, meaning the
    bare message). All P·N single-block rows go through ONE vectorized
    compression; rows whose padded length exceeds one block use
    hashlib (identical output, rare for shingle-sized input).
    """
    prefs = prefixes if prefixes is not None else [b""]
    n = len(msgs)
    out = np.empty((len(prefs), n, 2), dtype=np.uint64)
    if n == 0:
        return out

    lens = np.fromiter((len(s) for s in msgs), count=n, dtype=np.int64)
    flat = np.frombuffer(b"".join(msgs), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens)])
    plens = np.fromiter((len(p) for p in prefs), count=len(prefs), dtype=np.int64)
    short = lens + plens.max(initial=0) <= MD5_ONE_BLOCK_MAX
    idx_s = np.flatnonzero(short)

    if idx_s.size:
        ns = idx_s.size
        ls = lens[idx_s]
        # gather the short messages into a dense (ns, maxlen) byte
        # matrix once; per prefix the block is then
        # [prefix | msg | 0x80 | zeros | bitlen_le64]
        w = int(ls.max()) if ns else 0
        cols = np.arange(w, dtype=np.int64)
        take = cols[None, :] < ls[:, None]
        src = offs[idx_s][:, None] + cols[None, :]
        gather = np.zeros((ns, w), dtype=np.uint8)
        gather[take] = flat[src[take]]

        rows_per_pref = []
        for pi, p in enumerate(prefs):
            pl = int(plens[pi])
            blk = np.zeros((ns, 64), dtype=np.uint8)
            if pl:
                blk[:, :pl] = np.frombuffer(p, dtype=np.uint8)
            if w:
                view = blk[:, pl : pl + w]
                view[take] = gather[take]
            total = ls + pl
            blk[np.arange(ns), total] = 0x80
            # MD5 length field is little-endian by spec: pack through an
            # explicit '<u8' view so big-endian hosts produce the same
            # padding bytes (ADVICE r10; message words already use '<u4')
            blk[:, 56:64] = (
                (total.astype(np.uint64) * 8)
                .astype("<u8")[:, None]
                .view(np.uint8)
                .reshape(ns, 8)
            )
            rows_per_pref.append(blk)
        digs = _compress(np.concatenate(rows_per_pref, axis=0))
        out[:, idx_s, :] = digs.reshape(len(prefs), ns, 2)

    idx_l = np.flatnonzero(~short)
    for i in idx_l:
        mb = msgs[i]
        for pi, p in enumerate(prefs):
            dg = hashlib.md5(p + mb).digest()
            out[pi, i, 0] = int.from_bytes(dg[:8], "big")
            out[pi, i, 1] = int.from_bytes(dg[8:], "big")
    return out
