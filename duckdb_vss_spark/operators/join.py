"""Top-k vector joins: knn_join, vss_join, vss_match.

Reference surfaces re-expressed here:

- ``knn_join`` — the lateral top-k join entry point (``FROM queries,
  LATERAL (SELECT … FROM items ORDER BY dist LIMIT k)``). The reference
  pattern-matches DuckDB's decorrelated plan and swaps in a *single-
  threaded* custom operator (src/hnsw/hnsw_optimize_join.cpp:33-317,
  ParallelOperator()=false at :67-69). Ours parallelizes freely — that
  limitation is an implementation artifact, not a semantic (SURVEY §7.4).

  Two physical strategies:

  * ``crossjoin`` — crossJoin + window row_number ≤ k. This is exactly
    the logical plan DuckDB's binder produces *before* the reference's
    rewrite; Catalyst executes it as a shuffled window. Exact, fully
    expressed in native expressions, right choice when |queries|·|items|
    is modest.
  * ``broadcast`` — collect the query vectors (id + vector only) to a
    broadcast numpy matrix; ``mapInPandas`` over item partitions computes
    a partition-local top-k per query (vectorized numpy, float64);
    a final window over |queries|·P·k candidate rows produces the global
    top-k. Item payload is late-materialized by id-join after selection
    (the reference's rowid-fetch pattern, src/hnsw/hnsw_index_scan.cpp:
    79-88). This is the 100 TB shape: the full item table is never
    shuffled — only P·k rows per query move.

- ``vss_join`` / ``vss_match`` — the reference's brute-force SQL table
  macros (src/hnsw/hnsw_index_macros.cpp:10-75). Per the macro text:
  metric l2sq/'l2' scores with Euclidean ``array_distance`` and keeps the
  k *smallest*; 'cosine'/'cos' scores with ``array_cosine_similarity``
  and 'ip' with ``array_inner_product``, keeping the k *largest*.
  Output schemas mirror the macros: vss_join → (score, left_tbl STRUCT,
  right_tbl STRUCT); vss_match → left row + matches LIST<STRUCT{score,
  row STRUCT}>.

NULL semantics: pairs with NULL score are dropped (DuckDB aggregates
skip NULLs; NULL vectors never match — SURVEY §4.3.4).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import (
    array_cosine_similarity,
    array_distance,
    array_inner_product,
    distance_for_metric,
)

__all__ = ["knn_join", "knn_classify", "vss_join", "vss_match"]

# vss_* macro scoring: metric → (score function, keep-largest?)
_MACRO_SCORES = {
    "l2sq": (array_distance, False),
    "l2": (array_distance, False),
    "cosine": (array_cosine_similarity, True),
    "cos": (array_cosine_similarity, True),
    "ip": (array_inner_product, True),
}


def _macro_score(metric: str):
    if metric not in _MACRO_SCORES:
        raise ValueError("Unknown metric")  # matches macro error('Unknown metric')
    return _MACRO_SCORES[metric]


def knn_join(
    queries: DataFrame,
    items: DataFrame,
    query_vec_col: str,
    item_vec_col: str,
    k: int,
    metric: str = "l2sq",
    query_id_col: str | None = None,
    item_id_col: str | None = None,
    strategy: str = "crossjoin",
    dist_col: str = "dist",
    rn_col: str = "rn",
    queries_per_batch: int = 65536,
) -> DataFrame:
    """For each query row, the k nearest item rows by the metric's distance.

    Output: query columns…, item columns…, ``dist_col`` (the metric's
    SQL-visible distance), ``rn_col`` (1-indexed rank per query — the
    reference join operator emits the same 1-indexed row_number,
    src/hnsw/hnsw_optimize_join.cpp:148).
    """
    if k <= 0:
        raise ValueError("k must be a positive integer")
    if strategy == "crossjoin":
        return _knn_join_crossjoin(
            queries, items, query_vec_col, item_vec_col, k, metric, dist_col, rn_col
        )
    if strategy == "broadcast":
        if query_id_col is None or item_id_col is None:
            raise ValueError("broadcast strategy requires query_id_col and item_id_col")
        return _knn_join_broadcast(
            queries, items, query_vec_col, item_vec_col, k, metric,
            query_id_col, item_id_col, dist_col, rn_col, queries_per_batch,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def _dedup_names(queries: DataFrame, items: DataFrame) -> DataFrame:
    clash = set(queries.columns) & set(items.columns)
    renamed = items
    for c in clash:
        renamed = renamed.withColumnRenamed(c, f"item_{c}")
    return renamed


def _knn_join_crossjoin(queries, items, qv, iv, k, metric, dist_col, rn_col):
    dist_fn = distance_for_metric(metric)
    items = _dedup_names(queries, items)
    iv_name = f"item_{iv}" if iv in queries.columns else iv
    # A synthetic per-row key keeps duplicate query rows distinct under
    # the window (partitioning by the row's values would merge them).
    q = queries.withColumn("__qrow", F.monotonically_increasing_id())
    j = q.crossJoin(items).withColumn(dist_col, dist_fn(F.col(qv), F.col(iv_name)))
    # NULLS LAST matches DuckDB's ORDER BY default: NULL distances (NULL
    # vector on either side) lose to every real distance but still fill
    # the limit when nothing better exists — the reference's lateral
    # tests pin exactly this (hnsw_lateral_join.test:46-67: a NULL outer
    # row still gets k arbitrary matches).
    w = Window.partitionBy("__qrow").orderBy(F.col(dist_col).asc_nulls_last(), *[
        F.col(c) for c in j.columns if c not in (dist_col, "__qrow", qv, iv_name)
    ])
    return (
        j.withColumn(rn_col, F.row_number().over(w))
        .where(F.col(rn_col) <= k)
        .drop("__qrow")
    )


def iter_query_chunks(queries: DataFrame, qid: str, qv: str, chunk: int):
    """Stream the (id, vector) query set to the driver in bounded chunks
    via ``toLocalIterator`` — the driver never materializes the full
    query set (VERDICT r2 #2: whole-set ``toPandas()`` OOMs at 100×
    query scale). Yields (ids int64[n], mat float64[n, d]) with
    n ≤ chunk. NULL vectors are filtered Spark-side."""
    import numpy as np

    it = (
        queries.select(qid, qv)
        .where(F.col(qv).isNotNull())
        .toLocalIterator(prefetchPartitions=True)
    )
    buf_ids: list = []
    buf_vecs: list = []
    for row in it:
        buf_ids.append(row[0])
        buf_vecs.append(np.asarray(row[1], dtype=np.float64))
        if len(buf_ids) >= chunk:
            yield np.asarray(buf_ids, dtype=np.int64), np.stack(buf_vecs)
            buf_ids, buf_vecs = [], []
    if buf_ids:
        yield np.asarray(buf_ids, dtype=np.int64), np.stack(buf_vecs)


def _knn_join_broadcast(
    queries, items, qv, iv, k, metric, qid, iid, dist_col, rn_col,
    queries_per_batch: int = 65536,
):
    import numpy as np
    import pandas as pd

    sc = items.sparkSession.sparkContext
    # internal kernel names — the user's id columns may collide with
    # each other (a self-join kNN graph: query_id_col == item_id_col)
    # or with other columns; the real names come back at the
    # late-materialization joins below (review r15)
    out_schema = "__bq long, __bi long, __bd double"

    def chunk_candidates(ids_c: np.ndarray, mat_c: np.ndarray) -> DataFrame:
        bq = sc.broadcast((ids_c, mat_c))

        def search_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids_, mat = bq.value
            nq = len(ids_)
            # per-query running top-k across all batches of this partition
            best_d = np.full((nq, k), np.inf)
            best_i = np.full((nq, k), -1, dtype=np.int64)
            for pdf in batches:
                vecs = pdf[iv]
                mask = vecs.notna().to_numpy()
                if not mask.any():
                    continue
                x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs[mask]])
                xid = pdf[iid].to_numpy()[mask].astype(np.int64)
                # id-sort the batch so every stable operation below
                # breaks distance ties by ascending id — the same total
                # order as the finalizing window's ORDER BY dist, id
                # (ADVICE r8: without an in-kernel tie-break, equal
                # distances straddling the per-partition top-k cut could
                # drop the smaller-id candidate the oracle keeps).
                ro = np.argsort(xid, kind="stable")
                x, xid = x[ro], xid[ro]
                d = _pairwise_dist(x, mat, metric)  # (batch, nq)
                kk = min(k, d.shape[0])
                idx = np.argpartition(d, kk - 1, axis=0)[:kk]  # (kk, nq)
                dsel = np.take_along_axis(d, idx, axis=0)  # (kk, nq)
                # argpartition picks arbitrarily among ties at the cut;
                # redo the columns where candidates tied with the kk-th
                # distance fell outside it — rows are id-sorted, so a
                # stable sort realizes the (dist, id) order. One
                # vectorized sort over the flagged submatrix (ADVICE
                # r9: the per-column Python loop degraded to
                # O(nq·batch log batch) on duplicate-heavy corpora
                # where every column ties at the cut).
                t = dsel.max(axis=0)
                flagged = np.flatnonzero((d <= t[None, :]).sum(axis=0) > kk)
                if len(flagged):
                    sub = d[:, flagged]
                    sel = np.argsort(sub, axis=0, kind="stable")[:kk]
                    idx[:, flagged] = sel
                    dsel[:, flagged] = np.take_along_axis(sub, sel, axis=0)
                # (dist, id) lexicographic merge into the running top-k
                cat_d = np.concatenate([best_d, dsel.T], axis=1)
                cat_i = np.concatenate([best_i, xid[idx].T], axis=1)
                order = np.lexsort((cat_i, cat_d))[:, :k]
                best_d = np.take_along_axis(cat_d, order, axis=1)
                best_i = np.take_along_axis(cat_i, order, axis=1)
            valid = best_i >= 0
            if valid.sum():
                qrep = np.repeat(ids_, valid.sum(axis=1))
                yield pd.DataFrame(
                    {"__bq": qrep, "__bi": best_i[valid], "__bd": best_d[valid]}
                )

        return items.select(iid, iv).mapInPandas(search_partition, schema=out_schema)

    # chunked query streaming: driver peak = one chunk (+ its broadcast
    # blocks, which the BlockManager can spill), never the full set
    candidates = None
    for ids_c, mat_c in iter_query_chunks(queries, qid, qv, queries_per_batch):
        part = chunk_candidates(ids_c, mat_c)
        candidates = part if candidates is None else candidates.unionByName(part)
    items_d = _dedup_names(queries, items)
    iid_d = f"item_{iid}" if iid in queries.columns else iid
    # NULL-vector query rows still get k (arbitrary, here: lowest-id)
    # matches with NULL dist — crossjoin/reference-lateral parity
    # (review r15: the kernel filters them, so they vanished under
    # this strategy while hnsw_lateral_join.test pins that they stay)
    # partitioned by a synthetic per-row key, like __qrow in the
    # crossjoin strategy (ADVICE r15: partitioning by the USER qid let
    # duplicate — or NULL — query ids share one window partition, so rn
    # ran 1..2k and rows past k leaked out); the rn <= k filter guards
    # the same invariant from the other side
    null_q = queries.where(F.col(qv).isNull()).withColumn(
        "__nqrow", F.monotonically_increasing_id()
    )
    if candidates is None:
        topk = None
    else:
        w = Window.partitionBy("__bq").orderBy(
            F.col("__bd").asc(), F.col("__bi")
        )
        topk = (
            candidates.withColumn(rn_col, F.row_number().over(w))
            .where(F.col(rn_col) <= k)
        )
        # late materialization: fetch payload columns by id after
        # selection — every query column (including the vector) and
        # every (dedup-renamed) item column, the crossjoin contract
        topk = (
            topk.join(queries, topk["__bq"] == queries[qid], "inner")
            .join(items_d, F.col("__bi") == items_d[iid_d], "inner")
            .withColumnRenamed("__bd", dist_col)
            .drop("__bq", "__bi")
        )
    arb = (
        items_d.orderBy(F.col(iid_d))
        .limit(k)
        .withColumn(dist_col, F.lit(None).cast("double"))
    )
    null_part = (
        null_q.crossJoin(arb)
        .withColumn(
            rn_col,
            F.row_number().over(
                Window.partitionBy("__nqrow").orderBy(F.col(iid_d))
            ),
        )
        .where(F.col(rn_col) <= k)
        .drop("__nqrow")
    )
    if topk is None:
        return null_part
    return topk.unionByName(null_part)


def _pairwise_dist(x, q, metric):
    """(batch, d) × (nq, d) → (batch, nq) distances, float64.

    l2 uses the norm expansion for the matmul fast path; selected
    distances are rank-exact for top-k at embedding-normalized
    magnitudes, but the expansion cancels catastrophically for
    components around 1e8 — at such magnitudes near-ties can flip vs
    the crossjoin strategy's direct fold and the emitted dist loses
    precision (recompute downstream if bit-exact values are needed).
    """
    import numpy as np

    if metric == "l2sq":
        d2 = (x * x).sum(1)[:, None] + (q * q).sum(1)[None, :] - 2.0 * (x @ q.T)
        return np.sqrt(np.maximum(d2, 0.0))
    if metric == "cosine":
        # an exactly-zero vector pins its pairs to distance 2.0 —
        # DuckDB's convention (array_cosine_similarity with a zero or
        # NaN norm returns -1.0, so 1 - sim = 2.0), which the native
        # Column path now mirrors too (review r15); a maximally-far
        # real value, so it loses to every genuine distance but still
        # fills the limit. Near-zero norms keep the 1e-30 floor so
        # they stay finite (same floor as hnsw_graph._rank_dist).
        xnorm = np.linalg.norm(x, axis=1, keepdims=True)
        qnorm = np.linalg.norm(q, axis=1, keepdims=True)
        xn = x / np.maximum(xnorm, 1e-30)
        qn = q / np.maximum(qnorm, 1e-30)
        d = 1.0 - xn @ qn.T
        dead = (xnorm == 0.0) | (qnorm == 0.0).T
        if dead.any():
            d = np.where(dead, 2.0, d)
        return d
    if metric == "ip":
        return -(x @ q.T)
    raise ValueError(f"unknown metric {metric!r}")


def _as_struct(df: DataFrame, name: str) -> DataFrame:
    return df.select(F.struct(*df.columns).alias(name))


def vss_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int,
    metric: str = "l2sq",
) -> DataFrame:
    """Brute-force top-k join, macro-shaped output (score, left_tbl, right_tbl).

    Reference: VSS_JOIN_MACRO, src/hnsw/hnsw_index_macros.cpp:10-47.
    """
    score_fn, keep_largest = _macro_score(metric)
    l = _as_struct(left, "left_tbl").withColumn("__lrow", F.monotonically_increasing_id())
    r = _as_struct(right, "right_tbl")
    j = (
        l.crossJoin(r)
        .withColumn("score", score_fn(F.col(f"left_tbl.{left_col}"), F.col(f"right_tbl.{right_col}")))
        .where(F.col("score").isNotNull())
    )
    order = F.col("score").desc() if keep_largest else F.col("score").asc()
    w = Window.partitionBy("__lrow").orderBy(order, F.col("right_tbl"))
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .select("score", "left_tbl", "right_tbl")
    )


def vss_match(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    k: int,
    metric: str = "l2sq",
) -> DataFrame:
    """Correlated match list: left row + matches LIST<STRUCT{score, row}>.

    Reference: VSS_MATCH_MACRO, src/hnsw/hnsw_index_macros.cpp:49-75
    (used as ``FROM s, vss_match(t1, s.vec, vec, k)``).
    """
    score_fn, keep_largest = _macro_score(metric)
    l = _as_struct(left, "__left").withColumn("__lrow", F.monotonically_increasing_id())
    r = _as_struct(right, "row")
    # Single-pass shape (ADVICE r15 medium): the previous version joined
    # ``l`` back against an aggregate derived from ``l`` — the same
    # subtree evaluated twice, so a nondeterministic input (round-robin
    # repartition, sample) could assign DIFFERENT __lrow values on the
    # two sides and silently pair left rows with the wrong match list.
    # Here ``l`` appears exactly once: a condition-TRUE left outer join
    # keeps every left row even against an EMPTY right table (the NULL
    # right row scores NULL and collect_list skips it), and the left
    # struct rides through the aggregation as a group key, so no second
    # evaluation ever happens. __lrow stays in the key purely to keep
    # duplicate left rows distinct.
    j = l.join(r, F.lit(True), "left").withColumn(
        "score", score_fn(F.col(f"__left.{left_col}"), F.col(f"row.{right_col}"))
    )
    sort_key = -F.col("score") if keep_largest else F.col("score")
    pairs = F.collect_list(
        F.when(
            F.col("score").isNotNull(),
            F.struct(sort_key.alias("__s"), F.col("score"), F.col("row")),
        )
    )
    agg = j.groupBy("__lrow", "__left").agg(
        F.transform(
            F.slice(F.array_sort(pairs), 1, k),
            lambda p: F.struct(p["score"].alias("score"), p["row"].alias("row")),
        ).alias("matches")
    )
    # the macro is an UNGROUPED aggregate correlated per left row
    # (min_by/max_by over the right table) — it yields exactly one row
    # per left row even when no pair scores (empty right table, all-NULL
    # vectors), with a NULL matches value, DuckDB's aggregate-over-empty
    # convention (review r15; collect_list over only-skipped rows gives
    # [], mapped back to NULL here).
    return agg.select(
        "__left.*",
        F.when(F.size("matches") > 0, F.col("matches")).alias("matches"),
    )


def knn_classify(
    queries: DataFrame,
    items: DataFrame,
    query_vec_col: str,
    item_vec_col: str,
    label_col: str,
    k: int = 5,
    metric: str = "l2sq",
    query_id_col: str = "vec_id",
    item_id_col: str = "vec_id",
    strategy: str = "crossjoin",
) -> DataFrame:
    """Majority-vote kNN classification: (qid, label, votes) — each
    query takes the most frequent label among its ``k`` nearest items
    (vote ties → smaller label; distance ties at the k-boundary →
    smaller item id, the same convention every knn oracle here pins).

    The standard embedding-space label-propagation step of a data
    pipeline: spreading quality/topic/safety labels from a small
    curated set to the full corpus. Candidate generation is
    ``knn_join`` — brute-force here for the oracle-exact path; at
    corpus scale generate candidates with the HNSW/IVF index
    (``HnswIndex.knn_join`` / ``IvfIndex``) and apply the identical
    vote aggregation, which shuffles only (qid, label) pairs."""
    qs = queries.select(
        F.col(query_id_col).alias("qid"), F.col(query_vec_col).alias("__qv")
    )
    # rid precedes label so the knn window's residual tie-break order is
    # (dist, rid, ...) — matching the oracles' ORDER BY dist, rid
    rs = items.select(
        F.col(item_id_col).alias("rid"),
        F.col(label_col).alias("__lab"),
        F.col(item_vec_col).alias("__rv"),
    )
    nn = knn_join(
        qs, rs, "__qv", "__rv", k, metric,
        query_id_col="qid", item_id_col="rid", strategy=strategy,
    )
    votes = nn.groupBy("qid", "__lab").agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("qid").orderBy(
        F.col("votes").desc(), F.col("__lab").asc()
    )
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("qid", F.col("__lab").alias("label"), F.col("votes").cast("bigint").alias("votes"))
    )
