"""DuckDB-compatible seeded ``random()`` stream (r15, VERDICT r14 #6).

DuckDB's ``random()`` is a PCG32 generator (PCG XSH-RR 64/32,
O'Neill 2014, pcg-random.org — a public algorithm) with two levels of
state, reproduced here from observable behavior and pinned
EMPIRICALLY against the contracted duckdb oracle
(tests/test_duckrandom.py — the reproduced stream renders
hnsw_lateral_join_group.test's expected neighbor ids exactly):

- ``setseed(x)`` (x in [-1, 1]) seeds the CONNECTION engine with
  ``uint32((x + 1.0) * (UINT32_MAX // 2))`` using pcg-cpp's one-arg
  seeding ``state0 = (seed + INC) * MULT + INC``;
- each ``random()`` EXPRESSION instance draws ONE uint32 from the
  connection engine as its own local seed (DuckDB's function-local
  state, initialized per expression left-to-right), seeds a local
  PCG32 the same way, and emits ``local() / 2**32`` sequentially
  per row.

The row-k value is computed by LCG jump-ahead —
``state_k = A^k * state_0 + (A^k - 1)/(A - 1) * C  (mod 2^64)`` —
via binary decomposition of k, vectorized over the batch (~35 numpy
passes, no sequential scan). That makes the generator
PARTITION-INDEPENDENT: any executor computes any row slice from
(local_seed, ordinal) alone, so a seeded synthetic column needs no
driver loop and no single-task funnel at any scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_MULT = 6364136223846793005
_INC = 1442695040888963407
_M64 = (1 << 64) - 1

_U_MULT = np.uint64(_MULT)
_U_INC = np.uint64(_INC)


class DuckRandomConnection:
    """The connection-level engine ``setseed`` reseeds; ``random()``
    expression instances draw their local seeds from it in order."""

    def __init__(self, seed: float):
        if not (-1.0 <= seed <= 1.0) or seed != seed:
            raise ValueError(
                "setseed accepts seed values between -1.0 and 1.0, inclusive"
            )
        s32 = int((seed + 1.0) * (0xFFFFFFFF // 2)) & 0xFFFFFFFF
        self._state = ((s32 + _INC) * _MULT + _INC) & _M64

    def next_u32(self) -> int:
        old = self._state
        self._state = (old * _MULT + _INC) & _M64
        x = (((old >> 18) ^ old) >> 27) & 0xFFFFFFFF
        rot = old >> 59
        return ((x >> rot) | (x << ((32 - rot) & 31))) & 0xFFFFFFFF


def _xsh_rr(state: np.ndarray) -> np.ndarray:
    x = (((state >> np.uint64(18)) ^ state) >> np.uint64(27)).astype(
        np.uint64
    ) & np.uint64(0xFFFFFFFF)
    rot = (state >> np.uint64(59)).astype(np.uint64)
    left = (np.uint64(32) - rot) & np.uint64(31)
    return ((x >> rot) | ((x << left) & np.uint64(0xFFFFFFFF))) & np.uint64(
        0xFFFFFFFF
    )


def stream_values(local_seed: int, ordinals: np.ndarray) -> np.ndarray:
    """The ordinal-k values (k 0-based, any order/slice) of the
    random() expression whose function-local engine was seeded with
    ``local_seed`` — float64 in [0, 1), exactly DuckDB's stream."""
    k = np.asarray(ordinals, dtype=np.uint64)
    state0 = np.uint64(((local_seed + _INC) * _MULT + _INC) & _M64)
    acc_mult = np.ones(len(k), dtype=np.uint64)
    acc_inc = np.zeros(len(k), dtype=np.uint64)
    cur_mult, cur_inc = _U_MULT, _U_INC
    with np.errstate(over="ignore"):
        remaining = k.copy()
        bit = 0
        while remaining.any() and bit < 64:
            mask = (remaining & np.uint64(1)).astype(bool)
            if mask.any():
                acc_inc[mask] = acc_inc[mask] * cur_mult + cur_inc
                acc_mult[mask] = acc_mult[mask] * cur_mult
            remaining >>= np.uint64(1)
            cur_inc = cur_inc * (cur_mult + np.uint64(1))
            cur_mult = cur_mult * cur_mult
            bit += 1
        state_k = acc_mult * state0 + acc_inc
    return _xsh_rr(state_k).astype(np.float64) / float(1 << 32)


def ensure_duck_random_udf(spark) -> str:
    """Register ``vss_duck_random(local_seed bigint, ordinal bigint)``
    and return its name. Registration is unconditional — it is
    idempotent and one py4j call per seeded statement, and caching on
    ``id(spark)`` would both leak dead ids and skip a FRESH session
    allocated at a recycled address (review r15). Arrow-batched — the
    jump-ahead runs vectorized per batch on executors."""
    name = "vss_duck_random"
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _duck_random(seed: pd.Series, ordinal: pd.Series) -> pd.Series:
        out = np.empty(len(seed), dtype=np.float64)
        if len(seed):
            # one statement can carry several expression instances —
            # group by the (constant-per-instance) seed
            sv = seed.to_numpy()
            kv = ordinal.to_numpy()
            for s in np.unique(sv):
                m = sv == s
                out[m] = stream_values(int(s), kv[m])
        return pd.Series(out)

    spark.udf.register(name, _duck_random)
    return name
