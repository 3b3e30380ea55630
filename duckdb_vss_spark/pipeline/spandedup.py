"""Exact-substring span deduplication — find the exact token runs that
repeat ACROSS documents, not just which documents are near-dups. This
is the span-level dedup of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (arXiv:2107.06499): memorization comes
from repeated substrings (boilerplate, licenses, quoted passages), and
the cure is locating the spans themselves.

The reference method builds a corpus-wide suffix array — inherently
sequential and memory-bound. The distributed equivalence this operator
uses: a token span of length >= W repeats across docs IFF every one of
its W-grams repeats. So:

1. positioned W-grams, map-only: (doc, pos, 60-bit md5 gram key) —
   one row per token position, JVM-side string build + md5, no Python;
2. repeated grams: groupBy gram key, keep keys seen in >= min_docs
   distinct docs (one shuffle of 8-byte keys; a partial
   countDistinct collapses map-side);
3. positions whose gram repeats, joined back on the 8-byte key
   (AQE broadcasts the repeated-key set when it is small — it usually
   is: boilerplate is rare relative to the corpus);
4. maximal runs via gaps-and-islands: consecutive positions collapse
   with the classic pos − row_number() group key — one window per doc.

Output spans are MAXIMAL (consecutive duplicated grams merge), with
span_tokens = run_length + W − 1 actual tokens covered.

Every step is relational and md5-keyed, so a SQL oracle reproduces the
spans bit-for-bit — unlike a suffix array, which has no SQL form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["duplicate_spans"]


def duplicate_spans(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    width: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal cross-document duplicated token spans.

    Returns (id_col, span_start, span_tokens): 0-based token offset and
    token length of each maximal span whose every ``width``-gram occurs
    in >= ``min_docs`` distinct documents. Docs shorter than ``width``
    tokens yield nothing.
    """
    if width < 1:
        raise ValueError("width must be >= 1")
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")

    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    base = docs.select(F.col(id_col), toks.alias("__toks"), n.alias("__n")).where(
        F.col("__n") >= width
    )
    # ``base`` feeds TWO consumers — the repeated-gram groupBy and the
    # position probe of the join — and Spark recomputes an unshared
    # subtree once per consumer: without an exchange here the whole
    # scan→tokenize map side runs TWICE (measured ~2x wall on an
    # already-wide input). The repartition is therefore UNCONDITIONAL:
    # its shuffle files are the materialization both branches reuse
    # (AQE ReusedExchange — the Spark analogue of the materialized CTE
    # a single-node engine plans for a twice-read subquery). It must
    # sit HERE, below the gram projection: both consumers need exactly
    # (id, __toks, __n), so the two exchange subtrees canonicalize
    # equal; placed above the explode, the branches' different column
    # pruning (the groupBy drops span_start) makes the subtrees
    # unequal and kills the reuse — measured, not theoretical.
    # localCheckpoint instead of the exchange is strictly worse
    # (row-object storage + GC; 2-8x slower at 32x). This also widens
    # a narrow scan (small corpus = one parquet split) across the
    # cluster, and keying by id hands the islands window its
    # partitioning. The per-position md5 above it still runs once per
    # branch — the price of exchange-level reuse; the gram projection
    # is ~7% of stage cost (profiled r7).
    base = base.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    g = (
        base
        .select(
            id_col,
            "__toks",
            F.explode(
                F.sequence(F.lit(0), (F.col("__n") - F.lit(width)).cast("int"))
            ).alias("span_start"),
        )
        .select(
            id_col,
            "span_start",
            F.conv(
                F.substring(
                    F.md5(
                        F.array_join(
                            F.slice(
                                F.col("__toks"),
                                F.col("span_start") + 1,
                                width,
                            ),
                            " ",
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("__gh"),
        )
    )
    repeated = (
        g.groupBy("__gh")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__gh")
    )
    hits = g.join(repeated, "__gh").select(id_col, "span_start")
    w = Window.partitionBy(id_col).orderBy("span_start")
    islands = hits.withColumn(
        "__grp", F.col("span_start") - F.row_number().over(w)
    )
    return (
        islands.groupBy(id_col, "__grp")
        .agg(
            F.min("span_start").alias("span_start"),
            (F.count(F.lit(1)) + F.lit(width - 1)).cast("bigint").alias(
                "span_tokens"
            ),
        )
        .select(id_col, F.col("span_start").cast("bigint"), "span_tokens")
    )
