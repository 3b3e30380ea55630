"""Unit tests for SemDeDup (pipeline/semdedup.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.semdedup import (
    assign_clusters,
    kmeans_centroids,
    seeded_centroids,
    semdedup_pairs,
)


def _vec_df(spark, mat):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestAssignClusters:
    def test_nearest_centroid_wins(self, spark):
        df = _vec_df(spark, [[0.0, 0.1], [10.0, 9.9], [0.2, -0.1]])
        C = np.array([[0.0, 0.0], [10.0, 10.0]])
        got = {
            r.vec_id: r.cluster_id
            for r in assign_clusters(df, "embedding", "vec_id", C).collect()
        }
        assert got == {0: 0, 1: 1, 2: 0}

    def test_tie_breaks_to_lowest_centroid_id(self, spark):
        df = _vec_df(spark, [[0.0, 0.0]])
        C = np.array([[1.0, 0.0], [-1.0, 0.0]])  # equidistant
        [r] = assign_clusters(df, "embedding", "vec_id", C).collect()
        assert r.cluster_id == 0

    def test_map_only_no_shuffle(self, spark):
        df = _vec_df(spark, [[0.0, 0.0], [1.0, 1.0]])
        C = np.array([[0.0, 0.0], [2.0, 2.0]])
        plan = (
            assign_clusters(df, "embedding", "vec_id", C)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_kmeans_centroids_separate_clear_clusters(self, spark):
        rng = np.random.default_rng(0)
        a = rng.normal(0.0, 0.05, (40, 4))
        b = rng.normal(5.0, 0.05, (40, 4))
        df = _vec_df(spark, np.vstack([a, b]))
        C = kmeans_centroids(df, "embedding", k=2, seed=3)
        asg = assign_clusters(df, "embedding", "vec_id", C)
        groups = {
            r.vec_id: r.cluster_id for r in asg.collect()
        }
        first = {groups[i] for i in range(40)}
        second = {groups[i] for i in range(40, 80)}
        assert len(first) == 1 and len(second) == 1 and first != second


class TestSemdedupPairs:
    def test_within_cluster_pairs_only(self, spark):
        # two near-identical vectors near centroid 0, one near centroid
        # 1 that is cosine-similar to them but in another cluster
        df = _vec_df(
            spark,
            [[1.0, 0.01], [1.0, 0.02], [5.0, 0.0]],
        )
        C = np.array([[1.0, 0.0], [5.0, 0.0]])
        got = semdedup_pairs(df, "embedding", "vec_id", C, threshold=0.9).collect()
        assert [(r.id_a, r.id_b) for r in got] == [(0, 1)]

    def test_threshold_filters(self, spark):
        df = _vec_df(spark, [[1.0, 0.0], [0.0, 1.0]])  # orthogonal
        C = np.array([[0.5, 0.5]])
        assert (
            semdedup_pairs(df, "embedding", "vec_id", C, threshold=0.5).count() == 0
        )

    def test_seeded_centroids_deterministic(self):
        a = seeded_centroids(4, 8, seed=9)
        b = seeded_centroids(4, 8, seed=9)
        assert np.array_equal(a, b)
        assert a.shape == (4, 8)
