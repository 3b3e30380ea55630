"""Corpus-level statistics for training-data curation.

Two ops every tokenizer/data-mix pipeline runs before training:

- **vocab_topk** — corpus vocabulary by frequency (the seed of any
  frequency-based tokenizer / coverage analysis). One partial-agg
  shuffle keyed by token (map-side combine collapses each partition to
  its local vocab first, so the exchange carries ~|vocab| rows per
  partition, not ~|tokens|), then a global top-k via
  TakeOrderedAndProject — no global sort of the full vocabulary.

- **oov_rate** — per-document out-of-vocabulary fraction against a
  reference vocabulary. The vocabulary is broadcast (it is top-k small
  by construction); the per-doc rate is a map-side join + one
  aggregation keyed by doc id. At 100 TB this is one scan + one
  skinny-keyed shuffle of (doc_id, two counters).

Ties in vocab_topk break by (freq DESC, token ASC) — fully
deterministic, and reproduced verbatim by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.text import tokens

__all__ = ["vocab_topk", "oov_rate"]


def vocab_topk(docs: DataFrame, text_col: str, k: int) -> DataFrame:
    """Top-k corpus tokens by frequency: (tok, freq), freq DESC, tok ASC."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = docs.select(F.explode(tokens(text_col)).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(k)
    )


def oov_rate(
    docs: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """Per-document OOV fraction vs ``vocab`` (a DataFrame with a
    ``tok`` column, e.g. ``vocab_topk``'s output). Returns
    (id_col, oov_rate). The rate is an exact integer ratio evaluated in
    one IEEE division — bit-reproducible across engines."""
    toks = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    hit = F.broadcast(vocab.select("tok").distinct().withColumn("inv", F.lit(True)))
    j = toks.join(hit, "tok", "left")
    return j.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("inv").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("oov_rate")
    )
