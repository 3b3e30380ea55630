"""SemDeDup — semantic (embedding-space) deduplication, after the
public SemDeDup recipe (Abbas et al., 2023, arXiv:2303.09540): cluster
the embedding space, then look for near-duplicate pairs ONLY within a
cluster. The cluster step turns the quadratic all-pairs cosine check
into k independent, bounded sub-problems — the difference between
"impossible at 10^9 docs" and "one shuffle keyed by cluster id".

Spark-first shape:

- **assignment is map-only JVM code** — the centroid list is inlined as
  an array-of-(distance-expr, id)-structs and `array_min` picks the
  lexicographic minimum (distance ASC, centroid id ASC tie-break). No
  shuffle, no Python, no UDF: each task assigns its rows inside
  whole-stage codegen. k centroids ride in the plan as literals
  (broadcast-by-construction).
- **pair generation** self-joins on cluster_id — ONE shuffle of
  (cluster, id, vec); within-cluster population is bounded by the
  cluster sizes (≈ n/k for balanced k-means), never the corpus.
- verification = exact cosine on candidate pairs only.

Centroids are explicit (data-independent for the oracle; use
``kmeans_centroids`` for real corpus-adaptive clustering — same
operator, better cluster balance). Distances/similarities evaluate
with the same sequential-fold kernels DuckDB uses (array_distance ≡
list_distance, array_cosine_similarity ≡ list_cosine_similarity —
bit-for-bit, pinned by q_knn_l2 / q_embedding_neardup), so a SQL
oracle reproduces cluster assignment AND pair scores exactly.

Compose the output with ``dedup_clusters`` + ``dedup_keep`` (the
near-dup terminal steps in pipeline/dedup.py) to materialize the
corpus keep-list.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import (
    array_cosine_similarity,
    array_distance,
)

__all__ = [
    "seeded_centroids",
    "kmeans_centroids",
    "assign_clusters",
    "semdedup_pairs",
]


def seeded_centroids(k: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian centroids — a pure function of
    (k, dim, seed), so a SQL oracle can inline the identical literals.
    Random centroids still induce a valid space partition (Voronoi
    cells); k-means ones are just better balanced."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((k, dim))


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    k: int,
    seed: int = 42,
    sample_rows: int = 65536,
    iters: int = 10,
) -> np.ndarray:
    """Corpus-adaptive centroids via the IVF trainer's seeded k-means
    on a bounded sample (driver-sized by construction)."""
    from duckdb_vss_spark.index.ivf import _kmeans

    frac_df = df.select(F.col(vec_col).alias("v")).limit(sample_rows)
    sample = np.asarray(
        [np.asarray(r.v, dtype=np.float64) for r in frac_df.collect()]
    )
    return _kmeans(sample, k, iters=iters, seed=seed)


def assign_clusters(
    df: DataFrame, vec_col: str, id_col: str, centroids: np.ndarray
) -> DataFrame:
    """Add ``cluster_id``: index of the L2-nearest centroid (ties →
    lowest index). Map-only; vectors are cast to double so the
    distance fold is bit-identical to DuckDB's list_distance.

    The centroid matrix rides as ONE nested-array literal and the
    per-centroid distance as ONE index-aware ``transform`` lambda (r7):
    the r6 form built k separate fold expressions, and Catalyst +
    AQE's per-stage replanning walked that O(k·dim) tree on every
    stage boundary — ~0.07 s of pure planning per centroid, dwarfing
    the actual 2000-row execution. Same sequential-fold distance, same
    (d, cid) struct-min tie-break, byte-identical assignments."""
    centroids = np.asarray(centroids, dtype=np.float64)
    v = F.col(vec_col).cast("array<double>")
    # one py4j round-trip for the whole matrix: F.lit(nested_list) makes
    # k·dim gateway calls (~0.3 s of socket chatter at k=8, dim=64 —
    # profiled), while a JSON literal is a single string that Catalyst
    # constant-folds to the same array<array<double>> before execution.
    # repr() keeps full float64 precision (shortest round-trip repr).
    payload = "[" + ",".join(
        "[" + ",".join(repr(float(x)) for x in c) + "]" for c in centroids
    ) + "]"
    cents = F.from_json(F.lit(payload), "array<array<double>>")
    cand = F.transform(
        cents,
        lambda c, i: F.struct(array_distance(v, c).alias("d"), i.alias("cid")),
    )
    return df.withColumn("cluster_id", F.array_min(cand).getField("cid").cast("int"))


def semdedup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    centroids: np.ndarray,
    threshold: float = 0.95,
) -> DataFrame:
    """Within-cluster near-duplicate pairs:
    (id_a, id_b, cluster_id, cos_sim) with id_a < id_b and
    cos_sim >= threshold. One shuffle keyed by cluster_id.

    Two-stage, like every near-dup family member here: CANDIDATES come
    from one BLAS matmul per cluster (an `applyInPandas` over the
    cluster groups — the full n_c × n_c similarity block in vectorized
    float64, with a 1e-6 margin so no oracle pair can be lost to
    summation-order differences); the exact engine-reproducible
    sequential-fold cosine then VERIFIES candidates only, so the
    expensive interpreted fold never touches the quadratic bulk. The
    per-task cost is bounded by the largest cluster (balanced k-means
    keeps that ≈ n/k; a degenerate centroid set degrades gracefully to
    the dense matmul, still ~100× faster than per-pair folds)."""
    import pandas as pd

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    # r7 profiling: the oracle-exact assignment (array_min over
    # sequential-fold distance structs) is INTERPRETED per element —
    # ~0.9 s for 2000×8×64 on one task — and the old plan computed it
    # three times (candidate branch + both payload joins). Two fixes:
    # (a) widen a narrow scan to the cluster (no-op at 100 TB where the
    # scan already has thousands of splits); (b) assign once — the
    # payload joins only need (id → vec), which the raw table already
    # is; cluster_id rides out of the applyInPandas key instead.
    from duckdb_vss_spark.sources.layout import widen_narrow_scan

    base = widen_narrow_scan(base, F.col("id"))
    asg = assign_clusters(base, "v", "id", centroids)
    margin = 1e-6

    def gen(key, pdf):
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy(dtype=np.int64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "cluster_id": pd.Series([], dtype=np.int32)}
            )
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sims = (mat @ mat.T) / np.outer(norms, norms)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold - margin
        return pd.DataFrame(
            {
                "id_a": ids[ia[keep]],
                "id_b": ids[ib[keep]],
                "cluster_id": np.full(int(keep.sum()), key[0], dtype=np.int32),
            }
        )

    cand = asg.groupBy("cluster_id").applyInPandas(
        gen, "id_a long, id_b long, cluster_id int"
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("__va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("__vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cos_sim", array_cosine_similarity(F.col("__va"), F.col("__vb"))
        )
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cluster_id", "cos_sim")
    )


def semdedup_oracle_sql(
    table: str,
    vec_col: str,
    id_col: str,
    centroids: np.ndarray,
    threshold: float,
) -> str:
    """Equivalent DuckDB SQL with the centroid literals inlined —
    identical assignment (list_distance + (d, cid) tie-break) and
    identical pair scores."""
    centroids = np.asarray(centroids, dtype=np.float64)
    values = ",\n      ".join(
        f"({i}, CAST([{', '.join(repr(float(x)) for x in c)}] AS DOUBLE[]))"
        for i, c in enumerate(centroids)
    )
    return f"""
    WITH c(cid, cv) AS (VALUES
      {values}
    ),
    a AS (
      SELECT {id_col} AS id, CAST({vec_col} AS DOUBLE[]) AS v FROM {table}
    ),
    ranked AS (
      SELECT id, v, cid,
             row_number() OVER (
               PARTITION BY id ORDER BY list_distance(v, cv), cid
             ) AS rn
      FROM a CROSS JOIN c
    ),
    m AS (SELECT id, v, cid FROM ranked WHERE rn = 1)
    SELECT x.id AS id_a, y.id AS id_b,
           x.cid AS cluster_id,
           list_cosine_similarity(x.v, y.v) AS cos_sim
    FROM m x JOIN m y ON x.cid = y.cid AND x.id < y.id
    WHERE list_cosine_similarity(x.v, y.v) >= {threshold!r}
    ORDER BY id_a, id_b
    """
