"""Sequence packing for training-data export.

LM pretraining consumes fixed-length token sequences; the standard
layout is **concat-then-chunk**: lay the (shuffled) corpus out as one
virtual token stream and cut it every ``budget`` tokens — documents may
straddle sequence boundaries, and no padding is wasted (vs. first-fit
bin packing, which is inherently sequential and leaves tail padding).

Distributed realization: the seeded 60-bit keyed hash (pipeline/sample.
hash60) gives every doc a deterministic (shard, pos) — the same global
permutation shuffle_shards exports — and packing becomes a running
token-offset within each shard:

    offset(doc) = sum of n_tok over docs EARLIER in its shard
    seq_id      = offset // budget     (per-shard sequence counter)
    seq_pos     = offset %  budget     (token position within sequence)

One window (partitionBy shard, orderBy pos) over rows carrying
(8-byte pos, int token count) — the payload never enters the sort, and
shards bound every partition's window state. Each shard packs
independently, which is exactly how a 1000-executor export writes
sequence files; determinism is end-to-end: same (seed, ids, budget) ⇒
byte-identical packing on any engine or partitioning (the DuckDB
oracle reproduces offsets/seq ids bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.sample import shuffle_shards
from duckdb_vss_spark.pipeline.text import token_count

__all__ = ["pack_sequences"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget: int,
    num_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Adds (shard, pos, n_tok, offset, seq_id, seq_pos) columns: the
    deterministic concat-then-chunk packing layout."""
    if budget < 1:
        raise ValueError("budget must be >= 1")
    laid = shuffle_shards(df, id_col, num_shards, seed=seed).withColumn(
        "n_tok", token_count(text_col)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("pos", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        laid.withColumn("offset", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("seq_id", F.floor(F.col("offset") / budget).cast("bigint"))
        .withColumn("seq_pos", (F.col("offset") % budget).cast("bigint"))
    )
