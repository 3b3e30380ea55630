"""Repetition / quality filters for training-data curation.

Gopher-style per-document repetition signals (Rae et al. 2021, "Scaling
Language Models: ... Gopher", §A1.1: repetition fractions, word-length
and symbol heuristics), adapted to this corpus (single-line, lowercase,
space-separated tokens — so the signals are token-level, not
line-level). Everything here is a pure Column expression: map-only,
JVM-side, zero shuffle — at 100 TB these filters run at scan speed
inside whole-stage codegen, fused with the parquet read.

The max-frequency and max-run statistics are computed IN-ROW with an
``aggregate`` fold over the token array (O(n log n) for the sorted
fold), never by exploding tokens into a shuffle: a per-doc statistic
must not cost a corpus-wide exchange. The DuckDB oracles compute the
same values relationally (unnest + gaps-and-islands / group-count),
which pins the fold's semantics from an independent direction.

Reference scope note: the reference extension (duckdb/duckdb_vss) has
no text-quality surface; these are north-star pipeline operators per
BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.text import tokens, word_ngrams

__all__ = [
    "max_token_run",
    "max_ngram_freq",
    "top_ngram_fraction",
    "duplicate_token_fraction",
    "mean_word_length",
    "repetition_keep",
]


def _max_adjacent_run(arr: Column) -> Column:
    """Longest run of equal adjacent elements in ``arr`` (0 for empty).

    Single sequential fold: acc = (prev, run, best). The "" sentinel for
    ``prev`` is safe — a first element equal to the sentinel still
    yields run 0+1 = 1, identical to the mismatch branch.
    """
    step = lambda a, x: F.struct(
        x.alias("prev"),
        F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.greatest(
            a["best"],
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
        ).alias("best"),
    )
    return F.aggregate(
        arr,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        step,
        lambda a: a["best"],
    )


def max_token_run(col) -> Column:
    """Longest adjacent repetition of a single token ("batch batch
    batch" -> 3). The classic degenerate-generation signal."""
    return _max_adjacent_run(tokens(col)).cast("int")


def max_ngram_freq(col, n: int) -> Column:
    """Occurrence count of the MOST FREQUENT word n-gram (0 if the doc
    has fewer than n tokens). Map-only: sort the n-gram list, then the
    longest equal-adjacent run in the sorted list IS the max frequency.
    """
    return _max_adjacent_run(F.array_sort(word_ngrams(col, n))).cast("int")


def top_ngram_fraction(col, n: int) -> Column:
    """Fraction of all word n-grams taken by the most frequent one
    (Gopher's top-n-gram fraction). 0.0 when the doc has no n-grams."""
    grams = word_ngrams(col, n)
    sz = F.size(grams)
    return (
        F.when(sz > 0, _max_adjacent_run(F.array_sort(grams)).cast("double") / sz)
        .otherwise(F.lit(0.0))
        .cast("double")
    )


def duplicate_token_fraction(col) -> Column:
    """1 - distinct/total tokens: the mass of repeated words."""
    t = tokens(col)
    return (
        F.lit(1.0)
        - F.size(F.array_distinct(t)).cast("double") / F.greatest(F.size(t), F.lit(1))
    ).cast("double")


def mean_word_length(col) -> Column:
    """Mean token length in characters (exact integer sum, one IEEE
    division — bit-reproducible across engines)."""
    t = tokens(col)
    total = F.aggregate(
        t, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    return (total.cast("double") / F.greatest(F.size(t), F.lit(1))).cast("double")


def repetition_keep(
    col,
    *,
    max_run_limit: int = 2,
    top_bigram_limit: float = 0.07,
    dup_token_limit: float = 0.68,
    min_mean_wlen: float = 2.0,
    max_mean_wlen: float = 10.0,
) -> Column:
    """Gopher-style keep decision from the repetition signals. The
    thresholds are adapted to this corpus's token-level signals; the
    shape (AND of per-signal cutoffs) is Gopher §A1.1's."""
    return (
        (max_token_run(col) <= max_run_limit)
        & (top_ngram_fraction(col, 2) <= top_bigram_limit)
        & (duplicate_token_fraction(col) <= dup_token_limit)
        & mean_word_length(col).between(min_mean_wlen, max_mean_wlen)
    ).alias("keep")
