"""Top-k query surface: single-query ANN scan + k-ary min_by/max_by.

Reference surfaces re-expressed here:

- ``knn_search`` — the ``SELECT … ORDER BY array_distance(vec, CONST)
  LIMIT k`` entry point. Without an index the reference executes exactly
  this plan; with an index its optimizer swaps in ``hnsw_index_scan``
  (src/hnsw/hnsw_optimize_scan.cpp:23-259). Spark's brute-force physical
  plan is ``TakeOrderedAndProject`` — a distributed heap top-k with
  map-side partial top-k, i.e. already the right shape at scale: each
  partition keeps k candidates, the driver merges P·k rows. The indexed
  path lives in ``duckdb_vss_spark.index``.

- ``min_by_k`` / ``max_by_k`` — the k-ary arg-min/arg-max aggregates
  (DuckDB's ``min_by(col, score, k)`` returning a LIST; the reference
  rewrites this to an ordered ``list()`` over an index scan,
  src/hnsw/hnsw_optimize_topk.cpp:22-235). Spark's builtin min_by is
  2-ary, so we use the sort-slice idiom: ``slice(array_sort(
  collect_list(struct(score, value))), 1, k)`` — collect_list has a
  map-side partial aggregate, and for small k the post-slice is cheap.

NULL semantics (SURVEY §4.3): NULL vectors/scores never win — the
reference excludes NULLs from the index and DuckDB aggregates skip NULL
arguments; we filter them explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import distance_for_metric

__all__ = ["knn_search", "min_by_k", "max_by_k", "topk_struct_agg"]


def knn_search(
    df: DataFrame,
    vec_col: str,
    query_vec,
    k: int,
    metric: str = "l2sq",
    dist_col: str = "dist",
) -> DataFrame:
    """Brute-force exact top-k nearest rows to ``query_vec``.

    Physical plan: scan → project(dist) → TakeOrderedAndProject(k) —
    partial top-k per partition, merge of P·k rows at the driver. No
    shuffle of the full table; scales linearly in data size and is the
    exact-recall baseline the ANN index is measured against.
    """
    if k <= 0:
        raise ValueError("k must be a positive integer")
    dist = distance_for_metric(metric)(F.col(vec_col), query_vec)
    return (
        df.where(F.col(vec_col).isNotNull())
        .withColumn(dist_col, dist)
        # NULL vectors never win (the reference never indexes NULLs);
        # a dimension-mismatched row RAISES at runtime via the distance
        # kernel's _pair_guard — DuckDB's array kernels error on size
        # mismatch (reference parity, VERDICT r9 #1 reconciliation).
        .where(F.col(dist_col).isNotNull())
        .orderBy(F.col(dist_col).asc(), *[F.col(c) for c in df.columns if c != vec_col])
        .limit(k)
    )


def topk_struct_agg(score: Column, value: Column, k: int, ascending: bool = True) -> Column:
    """Aggregate expression: list of the k best ``value``s by ``score``.

    ``array_sort`` on struct(score, value) orders by score then value —
    score ties therefore break deterministically by value (DuckDB's
    k-ary min_by breaks ties arbitrarily; deterministic is a refinement,
    required for hash-stable oracle comparison).
    """
    s = score if ascending else -score
    pairs = F.collect_list(
        F.when(score.isNotNull(), F.struct(s.alias("s"), value.alias("v")))
    )
    return F.transform(F.slice(F.array_sort(pairs), 1, k), lambda p: p["v"])


def min_by_k(df: DataFrame, value: Column, score: Column, k: int, alias: str = "min_by") -> DataFrame:
    """``SELECT min_by(value, score, k) FROM df`` — single-row LIST result."""
    return df.agg(topk_struct_agg(score, value, k, ascending=True).alias(alias))


def max_by_k(df: DataFrame, value: Column, score: Column, k: int, alias: str = "max_by") -> DataFrame:
    """``SELECT max_by(value, score, k) FROM df`` — single-row LIST result."""
    return df.agg(topk_struct_agg(score, value, k, ascending=False).alias(alias))
