"""Hybrid-retrieval fusion: combine independently-ranked result lists
(lexical BM25, vector ANN, any other retriever) into one ranking with
Reciprocal Rank Fusion — RRF, the public Cormack/Clarke/Buettcher
(SIGIR'09) method every hybrid search stack uses:

    rrf(d) = Σ_lists 1 / (k + rank_list(d))

RRF needs only ranks, not comparable scores, which is exactly why it
works across heterogeneous retrievers (BM25 scores and cosine
distances share no scale).

Scale shape: each input list is already top-n small (the retrievers
did the data-sized work); fusion is a union of (id, rank) pairs — a
few thousand skinny rows — one groupBy on id, one TakeOrdered. The
per-list contribution rounds through DECIMAL(18,12) before the sum so
accumulation order can't perturb the result (engine-reproducible, same
convention as every float aggregate in this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["add_rank", "rrf_fuse"]


def add_rank(df: DataFrame, id_col: str, *order: Column) -> DataFrame:
    """Attach a 1-based ``rank`` by the given order (callers should end
    the order with the id for a deterministic total order). Meant for
    already-top-n lists (single window partition — do NOT use on an
    unreduced table; rank the retriever's output, not its input)."""
    w = Window.orderBy(*order)
    return df.withColumn("rank", F.row_number().over(w))


def rrf_fuse(
    lists: list[DataFrame],
    id_col: str,
    k: int = 60,
    topk: int | None = None,
) -> DataFrame:
    """Fuse ranked lists (each with columns (id_col, rank)) into
    (id_col, rrf_score), ordered by (rrf_score DESC, id ASC). An id
    missing from a list simply contributes nothing for that list."""
    if not lists:
        raise ValueError("lists must be non-empty")
    if k < 1:
        raise ValueError("k must be >= 1")
    parts = []
    for df in lists:
        if id_col not in df.columns or "rank" not in df.columns:
            raise ValueError(f"each list needs columns ({id_col!r}, 'rank')")
        parts.append(
            df.select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(k) + F.col("rank")).cast("double"))
                .cast("decimal(18,12)")
                .alias("__c"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = (
        u.groupBy(id_col)
        .agg(F.sum("__c").cast("double").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
    )
    if topk is not None:
        if topk < 1:
            raise ValueError("topk must be >= 1")
        out = out.limit(topk)
    return out
