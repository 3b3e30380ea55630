"""Document chunking for RAG / context-window preparation: split each
document into fixed-size token windows with a configurable overlap —
the step between embedding a corpus and indexing it (every chunk of
`documents` becomes a row to embed and insert into the ANN index).

Entirely built-in Column expressions (split → sequence → explode →
slice → array_join): the whole operator is map-only, whole-stage
codegen, ZERO shuffles and zero Python — each input partition emits its
chunks independently, so throughput scales linearly with executors and
the operator composes with any downstream (embedding UDF, HNSW/IVF
build) without a repartition.

Chunk layout (the common sliding-window convention): chunk i covers
tokens [i·step, i·step + chunk_tokens) with step = chunk_tokens −
overlap; the last chunk starts at the last multiple of step strictly
below n (so it always reaches the tail, possibly shorter). A document
with fewer tokens than one chunk yields exactly one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.text import tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Returns (id_col, chunk_id, n_tokens, chunk_text):
    chunk_id 0-based, n_tokens = tokens actually in the chunk
    (= chunk_tokens except possibly the last), chunk_text the
    space-joined token window.
    """
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap

    toks = tokens(text_col)
    n = F.size(toks).cast("bigint")
    # number of extra chunks past the first: ceil((n - chunk)/step),
    # floored at 0 — integer arithmetic only (no float ceil).
    last = F.greatest(
        F.lit(0).cast("bigint"),
        (-F.floor((-(n - F.lit(chunk_tokens))) / F.lit(step))).cast("bigint"),
    )
    exploded = docs.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), last)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * F.lit(step)
    return exploded.select(
        id_col,
        "chunk_id",
        F.least(F.lit(chunk_tokens).cast("bigint"), F.col("__n") - start).alias(
            "n_tokens"
        ),
        F.array_join(
            F.slice(
                F.col("__toks"), (start + 1).cast("int"), F.lit(chunk_tokens)
            ),
            " ",
        ).alias("chunk_text"),
    )
