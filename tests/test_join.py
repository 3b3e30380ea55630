"""knn_join / vss_join / vss_match semantics vs the reference tests."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.operators import knn_join, vss_join, vss_match


def test_lateral_top1_exact(spark, lateral_ab):
    # hnsw_lateral_join.test:18-23 — each a-row's nearest b-row is its twin
    a, b = lateral_ab
    a2 = a.where(F.col("a_vec").isNotNull())
    out = knn_join(a2, b, "a_vec", "b_vec", 1).select("a_id", "b_str").collect()
    assert {(r["a_id"], r["b_str"]) for r in out} == {(1, "a"), (2, "b")}


def test_lateral_null_semantics(spark, lateral_ab):
    # hnsw_lateral_join.test:46-67 — NULL b-vec never wins while real
    # matches exist; NULL a-vec still receives k (arbitrary) matches
    a, b = lateral_ab
    out = knn_join(a, b, "a_vec", "b_vec", 2)
    rows = out.select("a_id", "b_str", "rn").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["a_id"], []).append(r["b_str"])
    assert sorted(by_id[1]) == ["a", "b"]
    assert sorted(by_id[2]) == ["a", "b"]
    assert len(by_id[3]) == 2  # NULL outer vec: k rows, arbitrary order
    # grouped form (hnsw_lateral_join.test:69-75)
    assert sorted(by_id) == [1, 2, 3]


def test_rn_is_one_indexed(spark, lateral_ab):
    a, b = lateral_ab
    out = knn_join(a, b, "a_vec", "b_vec", 2).select("rn").distinct().collect()
    assert sorted(r["rn"] for r in out) == [1, 2]


def test_vss_join_macro_shape(spark, grid):
    # hnsw_join_macro.test:19-24 — vss_join(s, t1, ..., 3): score <= 1.0
    s = spark.createDataFrame(
        [([5.0, 5.0, 5.0],), ([1.0, 1.0, 1.0],)], "s_vec array<float>"
    )
    out = vss_join(s, grid.select("vec", "id"), "s_vec", "vec", 3)
    assert out.columns == ["score", "left_tbl", "right_tbl"]
    rows = out.collect()
    assert len(rows) == 6
    assert all(r["score"] <= 1.0 for r in rows)


def test_vss_join_cosine_keeps_largest(spark):
    left = spark.createDataFrame([([1.0, 0.0],)], "v array<float>")
    right = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.1])],
        "id int, v array<float>",
    )
    out = vss_join(left, right, "v", "v", 2, metric="cosine").collect()
    # cosine metric keeps the k LARGEST similarities (macro max_by branch)
    ids = {r["right_tbl"]["id"] for r in out}
    assert ids == {1, 3}
    assert all(r["score"] > 0.9 for r in out)


def test_vss_match_list_shape(spark, grid):
    # hnsw_join_macro.test:27-44 — len(matches) = k per outer row
    s = spark.createDataFrame(
        [(1, [5.0, 5.0, 5.0]), (2, [1.0, 1.0, 1.0])], "sid int, s_vec array<float>"
    )
    out = vss_match(s, grid.select("vec", "id"), "s_vec", "vec", 3)
    rows = out.collect()
    assert len(rows) == 2
    for r in rows:
        assert len(r["matches"]) == 3
        scores = [m["score"] for m in r["matches"]]
        assert scores == sorted(scores)  # ascending for l2


def test_unknown_metric_error(spark, grid):
    with pytest.raises(ValueError, match="Unknown metric"):
        vss_join(grid, grid, "vec", "vec", 1, metric="bogus")


def test_broadcast_strategy_matches_crossjoin(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    items = emb.select("vec_id", "embedding")
    a = knn_join(q, items, "qvec", "embedding", 3).select("qid", "vec_id", "rn")
    b = knn_join(
        q, items, "qvec", "embedding", 3,
        query_id_col="qid", item_id_col="vec_id", strategy="broadcast",
    ).select("qid", "vec_id", "rn")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_knn_classify_majority_and_ties(spark):
    """The modal label among k neighbors wins (not the single nearest),
    vote ties break to the smaller label, and votes counts are exact."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.operators.join import knn_classify

    refs = spark.createDataFrame(
        [
            (1, 9, [0.0, 0.0]),   # nearest to q100, but outvoted
            (2, 2, [0.1, 0.0]),
            (3, 2, [0.0, 0.1]),
            (4, 5, [3.0, 3.0]),   # q200's neighborhood: labels {5,7} tie 1-1
            (5, 7, [3.1, 3.0]),
        ],
        "vec_id long, label int, embedding array<float>",
    )
    qs = spark.createDataFrame(
        [(100, [0.0, 0.01]), (200, [3.05, 3.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["qid"]: (r["label"], r["votes"])
        for r in knn_classify(
            qs, refs, "embedding", "embedding", "label", k=3
        ).collect()
    }
    assert got[100] == (2, 2)   # labels among k=3: {9, 2, 2} -> 2 wins
    # q200's k=3: items 4 (label 5), 5 (label 7), and item 2 (label 2,
    # the closest of the far cluster) -> 1-1-1 vote tie -> smallest label
    assert got[200] == (2, 1)


def test_knn_classify_broadcast_strategy_matches_crossjoin(spark):
    """The scale path (chunked broadcast knn_join) must produce the
    identical classification as the crossjoin oracle path."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.operators.join import knn_classify
    from duckdb_vss_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qs = emb.where(F.col("vec_id") % 17 == 0)
    rs = emb.where(F.col("vec_id") % 17 != 0)
    a = {
        (r["qid"], r["label"], r["votes"])
        for r in knn_classify(qs, rs, "embedding", "embedding", "label", k=5).collect()
    }
    b = {
        (r["qid"], r["label"], r["votes"])
        for r in knn_classify(
            qs, rs, "embedding", "embedding", "label", k=5, strategy="broadcast"
        ).collect()
    }
    assert a == b and len(a) > 0


def test_broadcast_kernel_distance_ties_break_by_id(spark):
    """ADVICE r8: exact-duplicate distances at the k boundary must
    resolve to the SMALLEST ids — the oracle's ORDER BY dist, rid — not
    whatever order argpartition/insertion happened to keep. 20 identical
    items tie at the same distance; k=5 must return ids 0..4 regardless
    of row order or partitioning, plus a mixed case where the tie group
    straddles the boundary behind two strictly-closer items."""
    import random

    from duckdb_vss_spark.operators.join import knn_join

    rng = random.Random(11)
    ids = list(range(20))
    rng.shuffle(ids)
    items = spark.createDataFrame(
        [(i, [0.0, 0.0]) for i in ids], "vec_id long, embedding array<float>"
    ).repartition(4)
    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<float>")
    got = sorted(
        r["vec_id"]
        for r in knn_join(
            q, items, "qvec", "embedding", 5,
            query_id_col="qid", item_id_col="vec_id", strategy="broadcast",
        ).collect()
    )
    assert got == [0, 1, 2, 3, 4]

    mixed = spark.createDataFrame(
        [(50, [0.5, 0.0]), (51, [0.6, 0.0])]
        + [(i, [0.0, 0.0]) for i in ids],
        "vec_id long, embedding array<float>",
    ).repartition(3)
    got2 = sorted(
        r["vec_id"]
        for r in knn_join(
            q, mixed, "qvec", "embedding", 5,
            query_id_col="qid", item_id_col="vec_id", strategy="broadcast",
        ).collect()
    )
    # two closer items, then the 3 smallest ids of the dist-1.0 tie group
    assert got2 == [0, 1, 2, 50, 51]


def test_broadcast_kernel_all_ties_duplicate_corpus(spark):
    """ADVICE r9: a duplicate-heavy corpus (every item identical) ties
    every query column at the top-k cut on every batch — the repair
    must stay vectorized AND still produce the (dist, id) order: the k
    smallest ids win for every query."""
    from duckdb_vss_spark.operators.join import knn_join

    items = spark.createDataFrame(
        [(i, [1.0, 1.0]) for i in range(40)], "vec_id long, vec array<float>"
    )
    qs = spark.createDataFrame(
        [(q, [0.0, 0.0]) for q in range(3)], "qid long, qvec array<float>"
    )
    out = knn_join(qs, items, "qvec", "vec", 5, metric="l2sq")
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["rn"], r["vec_id"]))
    for q in range(3):
        assert sorted(got[q]) == [(rn, rn - 1) for rn in range(1, 6)]


def test_vss_match_keeps_left_rows_without_matches(spark):
    """Review r15: the reference macro is an ungrouped aggregate
    correlated per left row — one output row per left row even when no
    pair scores (empty right / all-NULL vectors), with NULL matches."""
    from duckdb_vss_spark.operators.join import vss_match

    left = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "id int, vec array<float>"
    )
    empty_right = spark.createDataFrame([], "id int, vec array<float>")
    out = vss_match(left, empty_right, "vec", "vec", k=2).collect()
    assert len(out) == 2
    assert all(r["matches"] is None for r in out)
    null_right = spark.createDataFrame(
        [(9, None)], "id int, vec array<float>"
    )
    out2 = vss_match(left, null_right, "vec", "vec", k=2).collect()
    assert len(out2) == 2 and all(r["matches"] is None for r in out2)
    # real matches still come back sorted
    real = spark.createDataFrame(
        [(7, [0.0, 0.1]), (8, [5.0, 5.0])], "id int, vec array<float>"
    )
    out3 = {
        r["id"]: [m["row"]["id"] for m in r["matches"]]
        for r in vss_match(left, real, "vec", "vec", k=1).collect()
    }
    assert out3 == {1: [7], 2: [7]}


def test_knn_join_broadcast_self_join_same_id_col(spark):
    """Review r15: query_id_col == item_id_col (a kNN-graph self-join)
    must work under the broadcast strategy, matching crossjoin."""
    from duckdb_vss_spark.operators.join import knn_join

    df = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(6)],
        "vec_id long, vec array<float>",
    )
    b = knn_join(
        df, df, "vec", "vec", 2,
        query_id_col="vec_id", item_id_col="vec_id", strategy="broadcast",
    )
    got = {(r["vec_id"], r["item_vec_id"], r["rn"]) for r in b.collect()}
    a = knn_join(df, df, "vec", "vec", 2)
    want = {(r["vec_id"], r["item_vec_id"], r["rn"]) for r in a.collect()}
    assert got == want


def test_knn_join_broadcast_null_query_and_zero_vector_parity(spark):
    """Review r15: under the broadcast strategy (a) a NULL-vector query
    row still gets k matches with NULL dist (crossjoin/reference
    lateral parity — it used to vanish), (b) the query vector column
    survives to the output, and (c) a zero vector under cosine gets
    dist 2.0 — DuckDB's -1.0 similarity convention — identically on
    both strategies (the native path used to CRASH under ANSI and the
    kernel fabricated 1.0)."""
    from duckdb_vss_spark.operators.join import knn_join

    queries = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 0.0])],
        "qid long, qv array<float>",
    )
    items = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [-1.0, 0.0]), (12, [0.5, 0.5])],
        "iid long, iv array<float>",
    )
    out = knn_join(
        queries, items, "qv", "iv", 2, metric="cosine",
        query_id_col="qid", item_id_col="iid", strategy="broadcast",
    )
    assert "qv" in out.columns  # (b)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {1, 2, 3}
    assert len(by_q[2]) == 2  # (a) NULL query keeps k rows
    assert all(r["dist"] is None for r in by_q[2])
    assert all(r["dist"] == 2.0 for r in by_q[3])  # (c) zero vector
    # both real queries' results match crossjoin exactly — including
    # the zero-vector one, which the crossjoin path can now serve
    # without an ANSI DIVIDE_BY_ZERO
    for q in (1, 3):
        cj = knn_join(
            queries.where(f"qid = {q}"), items, "qv", "iv", 2,
            metric="cosine",
        )
        want = {(r["iid"], r["rn"], r["dist"]) for r in cj.collect()}
        got = {(r["iid"], r["rn"], r["dist"]) for r in by_q[q]}
        assert got == want, q


def test_vss_match_single_pass_after_nondeterministic_repartition(spark):
    """ADVICE r15 (medium): vss_match used to evaluate the left subtree
    twice (once under the aggregate, once in the final self-join on
    __lrow); after a nondeterministic round-robin repartition the two
    evaluations could assign different __lrow values and pair left rows
    with the wrong match list. The single-pass shape evaluates the left
    side exactly once, so a repartitioned (and duplicate-bearing) input
    still yields one correct row per left row."""
    left = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [4.0, 4.0]), (2, [4.0, 4.0]), (3, None)],
        "id int, vec array<float>",
    ).repartition(5)  # round-robin: partition assignment is order-dependent
    right = spark.createDataFrame(
        [(7, [0.0, 0.1]), (8, [5.0, 5.0])], "id int, vec array<float>"
    )
    out = vss_match(left, right, "vec", "vec", k=1).collect()
    assert len(out) == 4  # both duplicate id=2 rows survive distinctly
    got = sorted(
        (r["id"], None if r["matches"] is None else r["matches"][0]["row"]["id"])
        for r in out
    )
    assert got == [(1, 7), (2, 8), (2, 8), (3, None)]
    # the left subtree appears exactly once in the optimized plan
    plan = out_plan = vss_match(left, right, "vec", "vec", k=1)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("monotonically_increasing_id") == 1


def test_knn_join_broadcast_duplicate_null_query_ids(spark):
    """ADVICE r15: duplicate (or NULL) user query ids among NULL-vector
    query rows shared one window partition, so rn ran 1..2k and rows
    past k leaked. Each NULL-vector row must get exactly k matches."""
    queries = spark.createDataFrame(
        [(1, None), (1, None), (None, None)],
        "qid long, qv array<float>",
    )
    items = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [-1.0, 0.0]), (12, [0.5, 0.5])],
        "iid long, iv array<float>",
    )
    out = knn_join(
        queries, items, "qv", "iv", 2,
        query_id_col="qid", item_id_col="iid", strategy="broadcast",
    ).collect()
    assert len(out) == 6  # 3 null-vector query rows x k=2, no leakage
    assert all(r["dist"] is None and r["rn"] in (1, 2) for r in out)
    assert all(r["iid"] in (10, 11) for r in out)  # lowest-id arbitrary matches


def test_dedup_clusters_rejects_nonpositive_max_iters(spark):
    """ADVICE r15: max_iters < 1 ran zero rounds and the for/else raise
    then referenced the unbound loop variable (NameError)."""
    from duckdb_vss_spark.pipeline.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="max_iters"):
        dedup_clusters(pairs, max_iters=0)
