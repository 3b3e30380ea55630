"""Deterministic distinct-count sketching (KMV / k-minimum values).

Corpus profiling at 100 TB wants approximate distinct counts (vocab
size per language/source, url/domain cardinality) without a
count-distinct shuffle of the full key set. Spark's built-in
``approx_count_distinct`` (HyperLogLog++) answers this but its hash is
engine-private — no other system can reproduce the estimate, so it
cannot be oracle-checked. KMV (Bar-Yossef et al. 2002, the
bottom-k/theta-sketch family) over the engine's reproducible 60-bit
md5-prefix hash gives the same O(k) memory/accuracy trade
(σ/μ ≈ 1/√(k−2)) with a FULLY deterministic estimate: any engine
hashing the same values derives bit-identical sketches and estimates.

Estimator: with U(k) the k-th smallest distinct hash value in [0, 2⁶⁰),
    n̂ = (k − 1) · 2⁶⁰ / U(k),   exact count when fewer than k distinct.

Distributed shape — the sketch property used where it matters, BEFORE
the shuffle: bottom-k sets are mergeable (bottom-k of a union = bottom-k
of the unioned bottom-ks), so

  1. one Arrow map stage prunes each batch to its local distinct
     bottom-k per group — the exchange carries ≤ k 8-byte hashes per
     (task-batch, group), never the distinct key set (the win over an
     exact count-distinct, whose exchange is Θ(|distinct|));
  2. one ``applyInPandas`` merge per group re-dedups, takes the global
     bottom-k, and emits the one-row estimate.

The float sequence (int64→double casts, one multiply, one divide) is
IEEE-identical to the SQL oracle's, so estimates hash-match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["kmv_distinct"]

_SPACE = float(2**60)

# the per-value hash is identical to sample.hash60 / the SQL idiom:
# CAST('0x' || substr(md5('<seed>_<val>'), 1, 15) AS BIGINT) — i.e. the
# big-endian first-8-bytes value of md5('<seed>_<val>') shifted right 4,
# computed batch-vectorized via md5vec.md5_u64 inside local_bottomk


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Per-group KMV distinct estimate of ``value_col``. Returns
    (group_cols..., n_est double, n_seen bigint) — ``n_seen`` is the
    sketch fill (= exact distinct count when < k). Deterministic: a
    pure function of (seed, distinct values)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    import pandas as pd

    groups = group_cols or []
    spark = df.sparkSession
    src = df.select(*groups, value_col)
    gschema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name in groups
    )
    mid_schema = (gschema + ", " if gschema else "") + "_hv long"
    out_schema = (gschema + ", " if gschema else "") + "n_est double, n_seen bigint"

    prefix = f"{seed}_".encode()

    def local_bottomk(batches):
        import numpy as np

        from duckdb_vss_spark.pipeline.md5vec import md5_u64

        for pdf in batches:
            pdf = pdf.dropna(subset=[value_col])
            if pdf.empty:
                continue
            # hash each batch's UNIQUE values in one vectorized md5
            # pass (md5vec, r10 — ~1.7× the per-row hashlib loop this
            # replaces, and no unbounded cross-batch memo dict to grow
            # in a long-lived worker)
            codes, uniques = pd.factorize(pdf[value_col])
            keys = [
                (u if isinstance(u, str) else str(u)).encode() for u in uniques
            ]
            uhv = (md5_u64(keys, [prefix])[0, :, 0] >> np.uint64(4)).astype(
                np.int64
            )
            hv = pd.Series(uhv[codes], index=pdf.index, dtype="int64")
            work = pdf[groups].copy() if groups else pd.DataFrame(index=pdf.index)
            work["_hv"] = hv
            if groups:
                out = (
                    work.drop_duplicates([*groups, "_hv"])
                    .sort_values([*groups, "_hv"], kind="stable")
                    .groupby(groups, sort=False)
                    .head(k)
                )
            else:
                out = (
                    work.drop_duplicates(["_hv"])
                    .nsmallest(k, "_hv")
                )
            yield out

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        hv = pdf["_hv"].drop_duplicates().nsmallest(k)
        n_seen = len(hv)
        if n_seen < k:
            est = float(n_seen)
        else:
            est = float(n_seen - 1) * _SPACE / float(int(hv.max()))
        row = {g: [pdf[g].iloc[0]] for g in groups}
        row["n_est"] = [est]
        row["n_seen"] = [n_seen]
        return pd.DataFrame(row)

    from pyspark.sql import functions as F

    mid = src.mapInPandas(local_bottomk, mid_schema)
    if groups:
        return mid.groupBy(*groups).applyInPandas(merge, out_schema)
    # global estimate: one synthetic group — a single merge task over
    # ≤ k rows per upstream batch
    return (
        mid.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(merge, out_schema)
    )
