"""Corpus-trained bigram language-model scoring — the perplexity
filter (CCNet / Gopher recipe: drop documents whose text is least
probable under a cheap LM; boilerplate, menus, and garbled extractions
score far worse than prose).

The LM is the corpus's own add-one-smoothed bigram model — no external
model artifact, so the whole pipeline is two aggregations over bigram
occurrences:

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
    score(doc) = mean over the doc's bigrams of ln P

Plan shape at 100 TB: one bigram-keyed count (map-side partial), one
prefix-keyed rollup of those counts (small), one join of occurrences
back to the two count tables (skinny keys), one per-doc aggregation.
No Python anywhere — tokenize/ngram/ln are all codegen'd expressions.

Cross-engine note (why the filter emits IDS, not raw floats): ``ln``
is the one operation here that is not IEEE-exact, and Spark's
``Math.log`` vs DuckDB's libm may differ in the last ulp. Per-doc
score gaps are ~1e-5 while cross-engine sum drift is ~1e-11, so the
RANKING is stable; the oracle therefore compares the selected ids
(rank key = score rounded to 6 decimals, ties → id — the rounding
also makes exact-duplicate documents tie exactly instead of by float
noise). Anyone needing the scores themselves reads ``bigram_scores``
and treats them as approximate to ~1e-11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_scores", "perplexity_filter"]


def bigram_scores(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document (id, n_bigrams, avg_logprob) under the corpus's
    add-one bigram LM. Documents with fewer than 2 tokens yield no
    row."""
    from duckdb_vss_spark.pipeline.text import word_ngrams

    from duckdb_vss_spark.pipeline.dedup import _materialize

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    vocab = toks.select(F.countDistinct("tok").alias("v"))
    bg = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_ngrams(text_col, 2)).alias("b"),
    )
    # r16 (guide §2.3, §2.4): the bigram-explode subtree used to be
    # re-evaluated for c12, again for c1 (via c12), and a third time as
    # the scoring join's probe side — 4 corpus scans per call counting
    # the vocab pass. Aggregate per-doc bigram MULTIPLICITIES once
    # (one corpus pass, and the exchange now carries distinct
    # (id, bigram, cnt) rows instead of every occurrence) and derive
    # c12, c1 and the scoring join from the materialized blocks. The
    # per-distinct-bigram logp is value-identical; the per-doc sum
    # regroups as cnt·logp, which the rank key's 6-decimal rounding
    # absorbs by design (same argument as the cross-engine libm drift
    # this operator already tolerates — see perplexity_filter).
    dbc = _materialize(
        bg.groupBy("id", "b").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # c12's two consumers (c1, the join) re-aggregate from dbc's
    # blocks — map-side partials over checkpointed rows, not worth a
    # second eager checkpoint job
    c12 = dbc.groupBy("b").agg(F.sum("cnt").alias("c12"))
    c1 = (
        c12.withColumn("w1", F.split(F.col("b"), " ")[0])
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    joined = (
        dbc.join(c12, "b")
        .withColumn("w1", F.split(F.col("b"), " ")[0])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    logp = F.log(
        (F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
    )
    return joined.groupBy("id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        (F.sum(F.col("cnt").cast("double") * logp) / F.sum("cnt")).alias(
            "avg_logprob"
        ),
    )


def perplexity_filter(
    docs: DataFrame, text_col: str, id_col: str, worst: int
) -> DataFrame:
    """The ``worst`` document ids by LM score (lowest avg bigram
    log-likelihood first): the drop-list of the perplexity filter.
    Deterministic across engines/partitionings: rank key = score
    rounded to 6 decimals (absorbs float-sum and libm-ulp noise, and
    makes exact-duplicate texts tie exactly), ties → smaller id.
    Returns (id, n_bigrams)."""
    from pyspark.sql import Window

    scored = bigram_scores(docs, text_col, id_col)
    w = Window.partitionBy().orderBy(
        F.round(F.col("avg_logprob"), 6).asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= worst)
        .select(F.col("id").alias(id_col), "n_bigrams")
    )
