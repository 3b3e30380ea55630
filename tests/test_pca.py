"""PCA power-iteration scoring (pipeline/pca.py).

The operator's contract is bit-exact engine-replayability: integer
Gram, integer iterations (DuckDB-truncating division), integer scores.
These tests pin partitioning-invariance, the numpy-free spec replica,
eigen-direction quality on a separable corpus, and degenerate input.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.pca import (
    gram_quantized,
    pca_power_scores,
    power_component,
)

QG = 1_000_000.0


def _mk(spark, mat, parts=1):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    df = spark.createDataFrame(rows, "vid long, v array<double>")
    return df.repartition(parts) if parts > 1 else df


def test_gram_partitioning_invariance(spark):
    rng = np.random.default_rng(2)
    mat = rng.normal(size=(300, 16))
    g1 = gram_quantized(_mk(spark, mat, 1), "v", 16)
    g7 = gram_quantized(_mk(spark, mat, 7), "v", 16)
    ref = np.floor((mat[:, :, None] * mat[:, None, :]) * QG + 0.5).astype(
        np.int64
    ).sum(axis=0)
    assert np.array_equal(g1, g7)
    assert np.array_equal(g1, ref)


def test_scores_match_pure_python_spec(spark):
    rng = np.random.default_rng(4)
    mat = rng.normal(size=(120, 8))
    got = {
        r["vid"]: r["pc1"]
        for r in pca_power_scores(_mk(spark, mat, 5), "v", "vid", dims=8).collect()
    }
    g = np.floor((mat[:, :, None] * mat[:, None, :]) * QG + 0.5).astype(
        np.int64
    ).sum(axis=0)
    v = np.asarray(power_component(g), dtype=np.int64)
    want = np.floor(mat * QG + 0.5).astype(np.int64) @ v
    assert got == {i: int(want[i]) for i in range(120)}


def test_component_tracks_leading_eigenvector(spark):
    # corpus with one dominant direction: the integer component must
    # align with numpy's leading eigenvector (|cos| > 0.99)
    rng = np.random.default_rng(6)
    d = rng.normal(size=12)
    d /= np.linalg.norm(d)
    mat = np.outer(rng.normal(size=400) * 5.0, d) + rng.normal(size=(400, 12)) * 0.1
    g = np.floor((mat[:, :, None] * mat[:, None, :]) * QG + 0.5).astype(
        np.int64
    ).sum(axis=0)
    v = np.asarray(power_component(g, iters=3), dtype=np.float64)
    w, vecs = np.linalg.eigh(g.astype(np.float64))
    lead = vecs[:, -1]
    cos = abs(v @ lead) / np.linalg.norm(v)
    assert cos > 0.99


def test_nulls_dropped_and_degenerate_zero(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [0.0, 0.0])],
        "vid long, v array<double>",
    )
    got = {r["vid"]: r["pc1"] for r in pca_power_scores(df, "v", "vid", dims=2).collect()}
    assert got == {0: 0, 2: 0}  # NULL row omitted; zero corpus -> zero scores


def test_dim_mismatch_raises(spark):
    df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], "vid long, v array<double>")
    with pytest.raises(Exception, match="expected 2-dim"):
        gram_quantized(df, "v", 2)
