"""Deterministic sampling + seeded shuffle-sharding for training-data
export.

Two operations every large-scale training pipeline needs and
``df.sample`` cannot provide:

- **hash_sample** — a Bernoulli sample that is a pure FUNCTION of
  (seed, id): the same rows are kept on any engine, any partitioning,
  any cluster size, any day. Spark's ``df.sample`` draws from a
  per-partition RNG stream, so its output changes with the physical
  split — useless for reproducible corpus construction or held-out
  splits. Hash thresholding is the standard fix (as used for dataset
  decontamination / train-test splitting in public LLM-data pipelines):
  keep a row iff the top 60 bits of md5(seed || '_' || id) fall below
  fraction·2⁶⁰.

- **shuffle_shards** — a seeded GLOBAL shuffle materialized as shard
  assignments: shard = h % num_shards, within-shard order = h. Training
  wants i.i.d.-looking input order; sorting by a keyed hash is a
  deterministic global permutation, and writing
  ``partitionBy(shard) ... sortWithinPartitions(shard, pos)`` streams it out
  with ONE shuffle at any scale (no global sort of the payload — the
  sort key is 8 bytes and rides the shuffle).

Both reuse the engine-reproducible 60-bit md5-prefix idiom of the dedup
family (md5 hex → first 15 nibbles → BIGINT), so a DuckDB oracle
computes identical keep-sets/shard assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hash_sample", "stratified_hash_sample", "shuffle_shards", "source_cap", "weighted_sample", "hash60"]


def hash60(id_col: Column | str, seed: int) -> Column:
    """60-bit uniform hash of (seed, id): first 15 hex digits of
    md5('<seed>_<id>') as a BIGINT — the same value any SQL engine
    derives via CAST('0x' || substr(md5(...), 1, 15) AS BIGINT).

    NULL-propagating (``concat``, not ``concat_ws`` — review r15): a
    NULL id hashes to NULL, so NULL < bound is NULL and the row drops
    from every hash-gated sample, exactly like the SQL form ('42_' ||
    CAST(NULL AS VARCHAR) IS NULL in DuckDB); concat_ws would have
    hashed every NULL id to the same md5('<seed>') value, keeping or
    dropping them as one block and diverging from the oracle."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat(F.lit(f"{int(seed)}_"), c.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: rows whose ``hash60`` falls under
    ``fraction`` of the 60-bit space. Map-only (no shuffle, no RNG
    state); the kept set is identical across engines, partitionings and
    cluster sizes. E[|sample|] = fraction·n with Binomial concentration;
    disjoint seeds give independent samples (held-out splits)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bound = int(fraction * float(2**60))
    return df.where(hash60(id_col, seed) < F.lit(bound))


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-group deterministic sampling — the data-mixing primitive
    (sample 10% of web, 100% of books, ...). Each row's keep decision
    is a pure function of (seed, id) against its group's threshold, so
    the mix is reproducible on any engine/partitioning AND monotone in
    the fraction: raising a group's fraction strictly grows its kept
    set (the hash order is a fixed global priority), which lets mix
    re-weights reuse already-materialized subsets. Map-only — the
    group threshold compiles to a CASE expression, no shuffle, no
    per-group job."""
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for group {g!r} must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    bound = F.lit(int(default_fraction * float(2**60)))
    gc = F.col(group_col)
    for g, f in sorted(fractions.items()):
        bound = F.when(gc == g, F.lit(int(f * float(2**60)))).otherwise(bound)
    return df.where(hash60(id_col, seed) < bound)


def shuffle_shards(
    df: DataFrame, id_col: str, num_shards: int, seed: int = 42
) -> DataFrame:
    """Seeded global shuffle for training-data export: adds ``shard``
    (h mod num_shards) and ``pos`` (h) columns. Writing with
    ``.repartition("shard").sortWithinPartitions("shard", "pos")``
    yields a deterministic global permutation in ONE shuffle — the
    payload is never globally sorted, only routed by an 8-byte key.
    The within-partition sort MUST lead with ``shard`` (review r15):
    hash repartitioning routes several shard values into one task when
    shuffle partitions < num_shards, and a ``partitionBy("shard")``
    writer re-sorts incoming rows by shard alone — sorting by bare
    ``pos`` would interleave shards and let that (unstable) writer
    sort scramble within-shard order; with (shard, pos) the writer
    sort is a stable prefix no-op. Deterministic given (seed, ids):
    re-running on re-partitioned input produces byte-identical
    shards."""
    if num_shards < 1:
        raise ValueError("num_shards must be >= 1")
    h = hash60(id_col, seed)
    return df.withColumn("pos", h).withColumn(
        "shard", (F.col("pos") % num_shards).cast("int")
    )


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    seed: int = 42,
    group_col: str | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    A-Res): the ``k`` rows with the largest key = ln(u)/w, where
    u = (hash60(seed, id)+1)/2⁶⁰ and w = ``weight`` > 0 — each row's
    inclusion probability is proportional to its weight, with no RNG
    state, so the sample is a pure function of (seed, ids, weights):
    identical on any engine, partitioning or cluster size (rows with
    w ≤ 0 are excluded). With ``group_col``, top-k per group — the
    quality-weighted variant of the data-mixing primitive ("k docs per
    source, preferring high-quality ones").

    One map pass + one rank window: Spark's WindowGroupLimit pushes
    the rank filter map-side, so the shuffle carries at most
    tasks·k rows per group, never the population. The key is rounded
    to 12 decimals before ranking (ties → min id) so the ordering
    never hinges on sub-ULP differences between the engines' libm
    ``ln`` — the one non-IEEE-exact operation in the key. Scope of
    that guarantee (review r15): the 1e-12 quantum exceeds the
    double's ULP only while |key| ≲ 4096, i.e. weights ≳ ~0.01; with
    far smaller weights (|ln(u)/w| beyond ~2⁵²·1e-12) a 1-ulp libm
    difference can still land two keys in different quanta and swap
    rows at the rank-k boundary across engines."""
    if k < 1:
        raise ValueError("k must be >= 1")
    u = (hash60(id_col, seed) + F.lit(1)).cast("double") / F.lit(float(2**60))
    key = F.round(F.log(u) / weight.cast("double"), 12)
    keyed = df.where(weight.cast("double") > 0).withColumn("__wkey", key)
    w = (
        Window.partitionBy(group_col) if group_col else Window.partitionBy()
    ).orderBy(F.col("__wkey").desc(), F.col(id_col).asc())
    return (
        keyed.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__wkey", "__rn")
    )


def source_cap(
    df: DataFrame, id_col: str, group_col: str, cap: int, seed: int = 42
) -> DataFrame:
    """Cap each group (domain / source / crawl host) at ``cap`` rows —
    the standard web-corpus guard against a single domain dominating
    the mix. Which rows survive is a deterministic uniform draw: rows
    rank within their group by the engine-reproducible ``hash60`` (ties
    impossible for distinct ids — the id is the tiebreak), and rank
    <= cap stays. So the kept subset is a pure function of
    (seed, ids), reproducible on any engine/partitioning, and NESTED:
    lowering the cap yields a subset of the higher-cap selection.

    Scale shape: rank-within-group compiles to row_number over
    (group, hash) — Spark plans a map-side WindowGroupLimit, so every
    task pre-prunes to ``cap`` rows per group BEFORE the single
    shuffle; a skewed mega-domain ships at most tasks·cap rows, not
    its full population."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    from pyspark.sql import Window

    h = hash60(id_col, seed)
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
