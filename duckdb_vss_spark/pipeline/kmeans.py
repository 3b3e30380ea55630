"""Distributed k-means (Lloyd) over an embedding column — the corpus
clustering primitive (SemDeDup prep, IVF coarse quantizers, topic
buckets), expressed so BOTH engines can replay every iteration
bit-for-bit.

Spark shape per iteration: broadcast the k×d centroid matrix as one
constant-folded literal, assign each vector map-only (the semdedup
argmin expression — one index-aware ``transform``, O(1) expression
size in k), then one partial-agg shuffle of (cluster, dim) keyed sums.
Driver state is k×d doubles only; vectors never leave the executors.
At 10⁹ vectors the cost is ``iters`` scans + ``iters`` skinny
shuffles — the canonical Spark iterative-ML shape.

Cross-engine exactness: float sums are order-dependent, and casting
doubles to DECIMAL is NOT portable (Spark rounds half-up, DuckDB
half-even — measured: identical inputs differ in the last digit). The
update step therefore quantizes each coordinate to an integer,
``floor(v·Q + 0.5)`` with Q = 10⁹, and sums BIGINTs: both engines
compute the identical double ``v·Q + 0.5`` (IEEE multiply/add), floor
is exact, and integer sums are associative — so the per-cluster means,
and hence every subsequent assignment, match to the bit with no
rounding-mode dependence. The 1e-9 coordinate quantization is part of
the algorithm spec, not a tolerance. |v|·Q·n must stay below 2⁶³:
holds for unit-scale embeddings up to ~10⁸ rows per cluster; shard
clusters or lower Q beyond that.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_fit", "kmeans_summary"]

_Q = 1_000_000_000.0


def _init_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int, seed: int
) -> np.ndarray:
    """Deterministic seeded init: the k vectors with the smallest
    60-bit keyed hash (ties → smaller id) — a uniform draw that any
    engine reproduces, unlike RNG-stream sampling. Cluster index =
    rank in that order."""
    from duckdb_vss_spark.pipeline.sample import hash60

    rows = (
        df.where(F.col(vec_col).isNotNull())
        .orderBy(hash60(id_col, seed), F.col(id_col))
        .limit(k)
        .select(F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} non-null vectors, got {len(rows)}")
    return np.asarray([r["v"] for r in rows], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Run ``iters`` Lloyd updates from the seeded init; returns the
    final k×d float64 centroid matrix. Each iteration: map-only
    nearest-centroid assignment (L2, ties → lowest index) + one
    (cluster, dim)-keyed BIGINT-sum shuffle; empty clusters keep their
    previous centroid."""
    # NULL vectors take no part in the fit (the oracle's WHERE
    # embedding IS NOT NULL); without this, assign_clusters would hand
    # them an engine-dependent struct-with-null cluster_id (ADVICE r7).
    df = df.where(F.col(vec_col).isNotNull())
    cents = _init_centroids(df, vec_col, id_col, k, seed)
    from duckdb_vss_spark.pipeline.semdedup import assign_clusters

    for _ in range(iters):
        assigned = assign_clusters(df, vec_col, id_col, cents)
        stats = (
            assigned.select(
                "cluster_id",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("p", "v"),
            )
            .groupBy("cluster_id", "p")
            .agg(
                F.sum(F.floor(F.col("v") * F.lit(_Q) + F.lit(0.5))).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        nxt = cents.copy()
        seen = np.zeros(k, dtype=bool)
        for r in stats:
            nxt[r["cluster_id"], r["p"]] = float(r["s"]) / r["n"] / _Q
            seen[r["cluster_id"]] = True
        cents = np.where(seen[:, None], nxt, cents)
    return cents


def kmeans_summary(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    iters: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Fit, then assign once more under the final centroids: returns
    (cluster_id, n, centroid array<double>) — the engine-reproducible
    clustering report (the oracle replays the identical iterations in
    SQL)."""
    from duckdb_vss_spark.pipeline.semdedup import assign_clusters

    df = df.where(F.col(vec_col).isNotNull())
    cents = kmeans_fit(df, vec_col, id_col, k, iters, seed)
    assigned = assign_clusters(df, vec_col, id_col, cents)
    counts = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    spark = df.sparkSession
    cent_df = spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(cents)],
        "cluster_id int, centroid array<double>",
    )
    return counts.join(cent_df, "cluster_id", "right").select(
        "cluster_id", F.coalesce("n", F.lit(0)).cast("bigint").alias("n"), "centroid"
    )
