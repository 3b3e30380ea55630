"""Distributed Lloyd k-means (pipeline/kmeans.py)."""

import numpy as np
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.kmeans import kmeans_fit, kmeans_summary


def _blobs(spark):
    # two tight blobs around (0,0) and (10,10); ids interleaved
    rows = []
    for i in range(40):
        base = [0.0, 0.0] if i % 2 == 0 else [10.0, 10.0]
        rows.append((i, [base[0] + (i % 5) * 0.01, base[1] - (i % 7) * 0.01]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_blobs(spark):
    df = _blobs(spark)
    cents = kmeans_fit(df, "embedding", "vec_id", k=2, iters=4, seed=1)
    cents = cents[np.argsort(cents[:, 0])]
    assert np.allclose(cents[0], [0.02, -0.03], atol=0.2)
    assert np.allclose(cents[1], [10.02, 9.97], atol=0.2)
    out = {r["cluster_id"]: r["n"] for r in
           kmeans_summary(df, "embedding", "vec_id", k=2, iters=4, seed=1).collect()}
    assert sorted(out.values()) == [20, 20]


def test_kmeans_is_partitioning_invariant(spark):
    df = _blobs(spark)
    a = kmeans_fit(df, "embedding", "vec_id", k=3, iters=3, seed=7)
    b = kmeans_fit(df.repartition(13), "embedding", "vec_id", k=3, iters=3, seed=7)
    # integer-quantized update sums -> bit-identical regardless of split
    assert np.array_equal(a, b)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 over 3 identical points: two clusters end up empty but their
    # centroids must survive (COALESCE path), counts 3/0/0
    df = spark.createDataFrame(
        [(1, [5.0, 5.0]), (2, [5.0, 5.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    out = kmeans_summary(df, "embedding", "vec_id", k=3, iters=2, seed=2)
    rows = {r["cluster_id"]: (r["n"], r["centroid"]) for r in out.collect()}
    assert sorted(n for n, _ in rows.values()) == [0, 0, 3]
    assert all(c == [5.0, 5.0] for _, c in rows.values())


def test_kmeans_excludes_null_vectors(spark):
    """ADVICE r7 fix pinned (r8 shipped it untested): NULL vectors take
    no part in the fit or the summary — same centroids as a pre-filtered
    frame, and no NULL-cluster row in the summary."""
    import numpy as np

    from duckdb_vss_spark.pipeline.kmeans import kmeans_fit, kmeans_summary

    rows = [(i, [float(i % 5), float((i * 7) % 3)]) for i in range(40)]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    clean = df.where(F.col("embedding").isNotNull())

    c_with = kmeans_fit(df, "embedding", "vec_id", k=3, iters=2, seed=5)
    c_without = kmeans_fit(clean, "embedding", "vec_id", k=3, iters=2, seed=5)
    np.testing.assert_array_equal(c_with, c_without)

    summ = kmeans_summary(df, "embedding", "vec_id", k=3, iters=2, seed=5)
    rows_ = summ.collect()
    assert all(r["cluster_id"] is not None for r in rows_)
    assert sum(r["n"] for r in rows_) == 40  # the 2 NULL rows don't count
