"""Scalar quantization (SQ8): 4× vector compression with an exactly
reproducible codec.

Rounds out the quantization family (HNSW full-precision graphs, IVF
routing, PQ/IVFADC codebooks): per-dimension affine uint8 codes — the
FAISS ``SQ8`` / Milvus ``SCALAR_QUANTIZER`` recipe. Each dimension's
[min, max] over the corpus maps to [0, 255]:

    code_i  = clamp(floor((v_i − mn_i) / (mx_i − mn_i) · 255 + 0.5), 0, 255)
    recon_i = mn_i + code_i / 255 · (mx_i − mn_i)

Training is one exact min/max aggregation (order-independent, so any
engine derives identical bounds — no sampled k-means, unlike PQ);
encoding and reconstruction are fixed-order IEEE arithmetic, so the
asymmetric (raw query × reconstructed corpus) distance is replayed
BIT-FOR-BIT by a SQL oracle — the one quantizer here whose scan the
gate can pin exactly rather than through a re-rank.

Scale shape: encode is map-only; the ADC scan reads (id, d bytes) per
row — 4× less than float32, composing with IVF partition pruning the
same way PQ does (prune rows × shrink bytes). The scan expression is
whole-stage-codegen'd JVM (transform + the pinned array_distance);
for 1000-dim-scale corpora swap in the PQ module's Arrow-batched
kernel shape — the codec math is identical.

Known trade-off vs PQ: SQ8 is 1 byte/dim (PQ: ~1 byte per 2-8 dims)
but has no codebook training, no per-subspace distortion, and exact
reproducibility; it is the standard first rung of the compression
ladder.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["train_sq", "sq_encode", "sq_reconstruct", "sq_knn"]


def train_sq(df: DataFrame, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (mins, maxs) over the corpus — one posexplode +
    (dim)-keyed min/max aggregation (exact, order-independent; partial
    aggs collapse map-side). Driver state is 2·d doubles."""
    rows = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("p", "v"))
        .groupBy("p")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .orderBy("p")
        .collect()
    )
    if not rows:
        raise ValueError("no non-null vectors to train on")
    mins = np.asarray([r["mn"] for r in rows], dtype=np.float64)
    maxs = np.asarray([r["mx"] for r in rows], dtype=np.float64)
    return mins, maxs


def _lit_arr(vals: np.ndarray) -> Column:
    # one constant-folded literal (not k py4j lit() calls — see the
    # perf note in semdedup.assign_clusters)
    payload = "[" + ",".join(repr(float(x)) for x in vals) + "]"
    return F.from_json(F.lit(payload), "array<double>")


def sq_encode(
    df: DataFrame, vec_col: str, mins: np.ndarray, maxs: np.ndarray,
    out_col: str = "codes",
) -> DataFrame:
    """Add ``out_col``: array<int> of uint8 codes. Map-only JVM
    expression; a constant dimension (mx == mn) encodes to 0."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    v = F.col(vec_col).cast("array<double>")
    code = F.transform(
        v,
        lambda x, i: F.when(
            mx[i] > mn[i],
            F.least(
                F.greatest(
                    F.floor((x - mn[i]) / (mx[i] - mn[i]) * F.lit(255.0) + F.lit(0.5)),
                    F.lit(0).cast("bigint"),
                ),
                F.lit(255).cast("bigint"),
            ),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .cast("int"),
    )
    return df.where(v.isNotNull()).withColumn(out_col, code)


def sq_reconstruct(
    codes_col: Column | str, mins: np.ndarray, maxs: np.ndarray
) -> Column:
    """array<double> reconstruction of a codes column — the exact
    expression the SQL oracle mirrors: mn + code/255·(mx−mn)."""
    c = F.col(codes_col) if isinstance(codes_col, str) else codes_col
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    return F.transform(
        c,
        lambda x, i: mn[i] + x.cast("double") / F.lit(255.0) * (mx[i] - mn[i]),
    )


def sq_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query: list[float],
    k: int,
    extra_cols: list[str] | None = None,
    mins: np.ndarray | None = None,
    maxs: np.ndarray | None = None,
) -> DataFrame:
    """End-to-end SQ top-k: train (unless bounds given) → encode →
    asymmetric distance (raw query vs reconstructed corpus, the pinned
    ``array_distance``) → TakeOrdered (dist, id). Emits the ADC
    distance itself — reproducible to the bit by the oracle."""
    from duckdb_vss_spark.functions.distance import array_distance

    if mins is None or maxs is None:
        mins, maxs = train_sq(df, vec_col)
    enc = sq_encode(df, vec_col, mins, maxs)
    recon = sq_reconstruct(F.col("codes"), mins, maxs)
    qv = F.from_json(
        F.lit("[" + ",".join(repr(float(x)) for x in query) + "]"),
        "array<double>",
    )
    cols = [id_col, *(extra_cols or [])]
    return (
        enc.withColumn("dist", array_distance(recon, qv))
        .select(*cols, "dist")
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
    )
