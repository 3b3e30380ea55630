"""End-to-end corpus curation: the one-call composition of the
pipeline's deterministic stages, each individually oracle-pinned, so
the WHOLE chain replays in SQL.

    quality filter  →  exact dedup  →  stratified mix  →  packing

Every stage is a pure function of (seed, content): the quality score
is in-row arithmetic, the dedup keep-set is min-id-per-fingerprint,
the mix is hash-thresholded per group, and the packing layout is the
seeded-hash window. No RNG state, no model, no driver data — re-running
on any engine, partitioning or cluster size reproduces the byte-same
training set, which is what makes a 100 TB curation run auditable and
resumable.

Plan shape: stage 1 and 3 are map-only and FUSE into the scans around
them; stage 2 is one fingerprint-keyed aggregation plus an id-only
anti-join (payloads never shuffle); stage 4 is one window over skinny
(pos, n_tok) rows per shard. Two shuffles end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["curate_corpus"]


def curate_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_quality: float,
    fractions: dict[str, float],
    default_fraction: float,
    budget: int,
    num_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Returns the packed training layout of the curated corpus:
    (id, group, n_tok, shard, offset, seq_id, seq_pos). Stages:

    1. drop docs with ``quality_score`` < ``min_quality``;
    2. exact-dedup survivors (keep the min id per normalized-text
       fingerprint);
    3. stratified hash sample: per-``group_col`` keep fractions
       (monotone in the fraction — re-weights reuse materialized
       subsets);
    4. ``pack_sequences`` over the kept set (seeded global layout,
       ``budget``-token sequences, ``num_shards`` independent shards).
    """
    from duckdb_vss_spark.pipeline.pack import pack_sequences
    from duckdb_vss_spark.pipeline.sample import stratified_hash_sample
    from duckdb_vss_spark.pipeline.text import fingerprint, quality_score

    good = docs.where(quality_score(text_col) >= F.lit(float(min_quality)))
    # keep-list = min id per fingerprint; anti-join the rest away by id
    keep = (
        good.select(F.col(id_col), fingerprint(text_col).alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    deduped = good.join(keep, id_col, "left_semi")
    # distinct derived seeds: the mix's keep-threshold hash and the
    # packing layout hash must be independent draws, or the kept docs
    # (low hash values) would all land at the front of every shard
    sampled = stratified_hash_sample(
        deduped, id_col, group_col, fractions, default_fraction, seed=seed
    )
    packed = pack_sequences(
        sampled, id_col, text_col, budget=budget, num_shards=num_shards,
        seed=seed + 1,
    )
    return packed.select(
        id_col,
        group_col,
        F.col("n_tok").cast("bigint").alias("n_tok"),
        F.col("shard").cast("int").alias("shard"),
        F.col("offset").cast("bigint").alias("offset"),
        "seq_id",
        "seq_pos",
    )
