"""Skew-mitigation join: salting for hot keys.

A shuffle join hashes rows by key — one pathological key (the null
user, the default domain, the empty document) lands an entire 100 TB
key group on ONE reducer. AQE's skew-join split handles many cases
(and stays on by default here), but it only splits the PROBE side of
a sort-merge join after materializing skewed partitions; pre-salting
is the deterministic fix when you know the join is hot, and the only
fix when the build side also can't broadcast.

`salted_join` replicates the (smaller, but not broadcastable) build
side ``salts`` times and scatters the fact side uniformly across the
salt space, so the hot key's rows spread over ``salts`` reducers. The
result is EXACTLY the plain join's result for inner/left-semi shapes —
which is why the oracle for the salted query is simply the unsalted
SQL: correctness is salt-invariant by construction.

The fact-side salt is derived with crc32 over the row's key + a
discriminator column (deterministic — same rows, same salts, any
partitioning), never `rand()` (per-partition RNG breaks retry
idempotence: a recomputed task would re-salt differently mid-query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    salts: int = 16,
    fact_disc: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on equality keys with the fact side
    salted across ``salts`` buckets and the dim side replicated.

    ``fact_disc``: a fact column whose values spread the hot key's rows
    (an id or timestamp); defaults to the first non-key column.
    ``how``: 'inner' or 'left' (fact-outer) — shapes where replication
    cannot duplicate or lose rows.
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in fact.columns or k not in dim.columns:
            raise ValueError(f"join key {k!r} must exist on both sides")
    disc = fact_disc or next(
        (c for c in fact.columns if c not in keys), keys[0]
    )
    f2 = fact.withColumn(
        "__salt",
        F.pmod(
            F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in [*keys, disc]])),
            F.lit(salts),
        ).cast("int"),
    )
    d2 = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = f2.join(d2, [*keys, "__salt"], how)
    return out.drop("__salt")
