"""BM25 keyword retrieval over a document corpus — the lexical
counterpart to the engine's vector search: hybrid (keyword + ANN)
retrieval needs both, and corpus curation uses the same machinery for
keyword-based quality probes.

Spark-first decomposition (Robertson/Spärck Jones BM25, the public
Okapi formulation):

- per-doc term frequencies: explode(tokens) filtered to the query's
  terms FIRST (the filter rides into the generated code, so the
  exchange only ever carries (doc, query-term) hits — at 100 TB the
  shuffle is proportional to query-term occurrences, not corpus size);
- document frequencies and corpus stats (N, avgdl) are tiny aggregates
  broadcast back (one row + |terms| rows);
- the score is a single JVM-side expression; the per-term partial
  scores are cast to DECIMAL(18,6) before the final per-doc sum so the
  accumulation order cannot perturb the result (bit-identical across
  engines and partitionings — same convention as every float aggregate
  in queries.py).

All integer statistics (tf, df, dl, N) are exact; floats enter only in
the final scoring expression, evaluated in one deterministic dataflow
on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.text import tokens

__all__ = ["bm25_scores"]


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int | None = None,
) -> DataFrame:
    """Score every document containing at least one query term.

    Returns (id_col, score) with
    score = sum over matching terms of
        ln(1 + (N - df + 0.5)/(df + 0.5)) ·
        tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    where dl is the document token length and avgdl the corpus mean.
    With ``topk`` set, returns the top-k by (score DESC, id ASC) via
    TakeOrderedAndProject — no global sort.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")

    # NOT widened (r7 A/B): the tokenize map pass with the term filter
    # inside it is ~0.2 s single-task at sf0.1 — an added repartition
    # shuffle measures 0.48 s -> 0.87 s. Narrow scans only pay off when
    # the map stage dominates (decode, shingling).
    #
    # r16 (guide §2.4, §8): the corpus used to be scanned THREE times
    # per query — the tf subtree twice (it feeds both dfreq and the
    # score join, and ReuseExchange never fires across the two
    # groupings — measured: 2 Generate / 3 doc scans in the executed
    # plan) and the stats agg once more. One map pass now computes the
    # per-doc length AND the query-term hits together; the materialized
    # proxy is SKINNY (id, dl, matched terms only — bounded by the
    # query's posting lists plus ~16 B/doc, never the text), and every
    # downstream statistic derives from its blocks. Exactness is
    # preserved term-for-term: dl is the same size(split) expression,
    # filter() keeps duplicate occurrences (array_intersect would not),
    # rows with NULL/empty text still count toward n_docs, and NULL
    # sizes stay NULL under the sum.
    from duckdb_vss_spark.pipeline.dedup import _materialize

    pre = docs.select(
        F.col(id_col),
        tokens(text_col).alias("__toks"),
    ).select(
        id_col,
        F.size("__toks").cast("bigint").alias("dl"),
        F.filter("__toks", lambda t: t.isin(query_terms)).alias("__hits"),
    )
    pre = _materialize(pre)
    hits = pre.select(id_col, "dl", F.explode("__hits").alias("term"))
    tf = hits.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    tf = _materialize(tf)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    stats = pre.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )

    j = tf.join(F.broadcast(dfreq), "term").crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    part = (
        idf
        * (tf_d * F.lit(k1 + 1.0))
        / (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl_d / avgdl))
    )
    scored = (
        j.select(id_col, part.cast("decimal(18,6)").alias("__p"))
        .groupBy(id_col)
        .agg(F.sum("__p").cast("double").alias("score"))
    )
    if topk is not None:
        if topk < 1:
            raise ValueError("topk must be >= 1")
        scored = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(topk)
    return scored


def bm25_oracle_ctes(
    name: str,
    table: str,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int | None = None,
) -> str:
    """The oracle dataflow as a WITH-clause body whose final CTE is
    ``name`` (id_col, score) — composable into larger oracle SQL
    (e.g. hybrid-retrieval fusion)."""
    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    limit = (
        f"ORDER BY score DESC, {id_col} LIMIT {int(topk)}"
        if topk is not None
        else ""
    )
    return f"""tok AS (
      SELECT {id_col},
             CAST(len(string_split({text_col}, ' ')) AS BIGINT) AS dl,
             unnest(string_split({text_col}, ' ')) AS term
      FROM {table}
    ),
    tf AS (
      SELECT {id_col}, term, dl, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE term IN ({terms})
      GROUP BY {id_col}, term, dl
    ),
    dfreq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split({text_col}, ' '))) AS BIGINT) AS sum_dl
      FROM {table}
    ),
    {name} AS (
      SELECT {id_col},
             CAST(sum(CAST(
               ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5))
               * (CAST(tf AS DOUBLE) * {k1 + 1.0!r})
               / (CAST(tf AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r} * CAST(dl AS DOUBLE)
                  / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))
             AS DECIMAL(18,6))) AS DOUBLE) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN stats
      GROUP BY {id_col}
      {limit}
    )"""


def bm25_oracle_sql(
    table: str,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topk: int | None = None,
) -> str:
    """The equivalent ANSI/DuckDB SQL — same dataflow, same DECIMAL
    rounding point, for oracle comparison."""
    ctes = bm25_oracle_ctes(
        "bm", table, text_col, id_col, query_terms, k1, b, topk
    )
    order = (
        f"ORDER BY score DESC, {id_col}" if topk is not None else f"ORDER BY {id_col}"
    )
    return f"""
    WITH {ctes}
    SELECT {id_col}, score FROM bm {order}
    """
