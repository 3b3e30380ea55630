"""MMR diversified re-selection (operators/mmr.py, NEW r11).

Pins: λ=1 degenerates to plain knn order; λ=0 spreads maximally after
the nearest-neighbor seed; diversity actually changes the pick on a
constructed near-duplicate shortlist; rank/order determinism; group
independence; k > n and edge cases; metric validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.operators.mmr import _mmr_group, _pair_dists, mmr_rerank


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "qid long, id long, vec array<double>, dist double"
    )


def test_lambda_one_is_plain_knn_order():
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(12, 8))
    q = rng.normal(size=8)
    dists = np.sqrt(((mat - q) ** 2).sum(axis=1))
    ids = np.arange(100, 112)
    sel = _mmr_group(ids, dists, mat, 5, 1.0, "l2")
    want = np.lexsort((ids, dists))[:5]
    assert [int(ids[i]) for i in sel] == [int(ids[i]) for i in want]


def test_diversity_skips_near_duplicate():
    """Three candidates: two near-identical close ones and one farther
    distinct one. Plain knn takes both near-dups; MMR at λ=0.5 must
    pick the distinct one second."""
    mat = np.array(
        [[0.0, 0.0], [0.0, 0.01], [5.0, 0.0]], dtype=np.float64
    )
    q = np.array([0.0, -1.0])
    dists = np.sqrt(((mat - q) ** 2).sum(axis=1))
    ids = np.array([1, 2, 3])
    sel = _mmr_group(ids, dists, mat, 2, 0.5, "l2")
    assert [int(ids[i]) for i in sel] == [1, 3]
    # and λ=1 keeps the near-duplicate instead
    sel_rel = _mmr_group(ids, dists, mat, 2, 1.0, "l2")
    assert [int(ids[i]) for i in sel_rel] == [1, 2]


def test_pair_dists_metrics():
    mat = np.array([[1.0, 0.0], [0.0, 1.0], [2.0, 0.0]])
    l2 = _pair_dists(mat, "l2")
    assert l2[0, 2] == pytest.approx(1.0)
    assert np.allclose(l2, l2.T) and np.allclose(np.diag(l2), 0.0)
    l2sq = _pair_dists(mat, "l2sq")
    assert np.allclose(l2sq, l2**2)
    cos = _pair_dists(mat, "cosine")
    assert cos[0, 2] == pytest.approx(0.0)  # same direction
    assert cos[0, 1] == pytest.approx(1.0)  # orthogonal
    ip = _pair_dists(mat, "ip")
    assert ip[0, 2] == pytest.approx(-2.0)


def test_spark_groups_are_independent(spark):
    rng = np.random.default_rng(7)
    rows = []
    for qid in (10, 20):
        mat = rng.normal(size=(8, 4))
        q = rng.normal(size=4)
        d = np.sqrt(((mat - q) ** 2).sum(axis=1))
        for i in range(8):
            rows.append((qid, qid * 100 + i, [float(x) for x in mat[i]], float(d[i])))
    out = mmr_rerank(_frame(spark, rows), "qid", "id", "vec", k=3, lam=0.5)
    got = {}
    for r in out.collect():
        got.setdefault(r["qid"], []).append((r["mmr_rank"], r["id"], r["dist"]))
    assert set(got) == {10, 20}
    for qid in (10, 20):
        ranks = sorted(got[qid])
        assert [rk for rk, _, _ in ranks] == [1, 2, 3]
        # kernel parity: the Spark result equals the local greedy
        sub = [r for r in rows if r[0] == qid]
        ids = np.array([r[1] for r in sub])
        mat = np.stack([np.asarray(r[2]) for r in sub])
        d = np.array([r[3] for r in sub])
        sel = _mmr_group(ids, d, mat, 3, 0.5, "l2")
        assert [i for _, i, _ in ranks] == [int(ids[i]) for i in sel]


def test_k_exceeding_candidates_returns_all(spark):
    rows = [(1, 7, [0.0, 0.0], 1.0), (1, 8, [1.0, 1.0], 2.0)]
    out = mmr_rerank(_frame(spark, rows), "qid", "id", "vec", k=10).collect()
    assert sorted(r["mmr_rank"] for r in out) == [1, 2]


def test_pair_dists_rejects_unknown_metric():
    with pytest.raises(ValueError, match="metric"):
        _pair_dists(np.zeros((2, 2)), "hamming")


def test_validation_spark(spark):
    df = _frame(spark, [(1, 2, [0.0], 0.5)])
    with pytest.raises(ValueError, match="lambda"):
        mmr_rerank(df, "qid", "id", "vec", k=3, lam=1.5)
    with pytest.raises(ValueError, match="k must be"):
        mmr_rerank(df, "qid", "id", "vec", k=0)
    with pytest.raises(ValueError, match="metric"):
        mmr_rerank(df, "qid", "id", "vec", k=1, metric="nope")


def test_hnsw_mmr_search_mode(spark, grid, tmp_path_factory):
    """Index-backed diversified search (the vector-store search_type=
    "mmr" mode): rank 1 is the plain nearest neighbor, k rows come
    back, and at ef >> k the selection equals the local greedy over
    the exact shortlist."""
    from duckdb_vss_spark.index import create_hnsw_index, drop_index
    from duckdb_vss_spark.operators import knn_search as brute

    path = str(tmp_path_factory.mktemp("mmridx") / "idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path, overwrite=True
    )
    try:
        qv = [2.0, 2.0, 2.0]
        out = idx.knn_search_mmr(grid, qv, 4, fetch_k=16, lam=0.5, ef_search=400)
        rows = sorted(out.collect(), key=lambda r: r["mmr_rank"])
        assert [r["mmr_rank"] for r in rows] == [1, 2, 3, 4]
        nn1 = brute(grid, "vec", qv, 1).first()["id"]
        assert rows[0]["id"] == nn1
        # parity with the local greedy over the exact 16-shortlist
        short = brute(grid, "vec", qv, 16).collect()
        ids = np.array([r["id"] for r in short], dtype=np.int64)
        mat = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in short])
        dists = np.array([r["dist"] for r in short], dtype=np.float64)
        sel = _mmr_group(ids, dists, mat, 4, 0.5, "l2")
        assert [r["id"] for r in rows] == [int(ids[i]) for i in sel]
        # diversity sanity: the MMR picks are more spread than plain knn
        import itertools

        def min_pair(ids_):
            vecs = {r["id"]: np.asarray(r["vec"], float) for r in short}
            return min(
                float(np.sqrt(((vecs[a] - vecs[b]) ** 2).sum()))
                for a, b in itertools.combinations(ids_, 2)
            )

        knn4 = [r["id"] for r in short[:4]]
        assert min_pair([r["id"] for r in rows]) >= min_pair(knn4)
    finally:
        drop_index(path)


def test_set_interactive_flips_and_restores(spark):
    from duckdb_vss_spark import set_interactive

    default_pf = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.parallelismFirst", "true"
    )
    set_interactive(spark, True)
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst")
        == "false"
    )
    set_interactive(spark, False)
    assert (
        spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", default_pf
        )
        == default_pf
    )


from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@st.composite
def _shortlist(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    d = draw(st.integers(min_value=2, max_value=6))
    mat = draw(
        arrays(
            np.float64,
            (n, d),
            elements=st.floats(-5, 5, allow_nan=False, width=32),
        )
    )
    q = draw(
        arrays(
            np.float64, (d,), elements=st.floats(-5, 5, allow_nan=False, width=32)
        )
    )
    k = draw(st.integers(min_value=1, max_value=n + 2))
    lam = draw(st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
    return mat, q, k, lam


@settings(max_examples=60, deadline=None)
@given(_shortlist())
def test_mmr_invariants(case):
    """Property pins for the greedy kernel: output is a prefix-ranked
    subset of the input of size min(k, n); rank 1 is the (dist, id)
    argmin; λ=1 reproduces plain knn order; no duplicates."""
    mat, q, k, lam = case
    n = len(mat)
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    dists = np.sqrt(((mat - q) ** 2).sum(axis=1))
    sel = _mmr_group(ids, dists, mat, k, lam, "l2")
    assert len(sel) == min(k, n)
    assert len(set(sel)) == len(sel)
    assert set(sel) <= set(range(n))
    knn_order = np.lexsort((ids, dists))
    assert sel[0] == int(knn_order[0])
    if lam == 1.0:
        assert sel == [int(i) for i in knn_order[: len(sel)]]
