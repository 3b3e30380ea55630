"""Binary quantization (BQ): 1-bit sign signatures + Hamming shortlist.

The third point on the engine's compression curve (HNSW = full
precision, SQ8 = 8 bits/dim, PQ = ~1-4 bits/dim, BQ = 1 bit/dim): each
dimension contributes its SIGN bit, so a 1024-dim float32 vector
becomes 128 bytes and a 64-dim one fits TWO bigint words — a 32×
scan-byte reduction with zero training. Modern vector stores ship
exactly this mode (binary quantization + Hamming prefilter + exact
rescore) because Hamming distance on packed words is the cheapest
distance there is, and sign agreement tracks angular similarity
(Charikar's SimHash bound: P[sign match] = 1 − θ/π per random
direction — here the directions are the coordinate axes, which is the
standard BQ simplification).

Spark realization — everything JVM-side, no UDF anywhere:

- **signature**: ``binary_signature(vec, dims)`` packs 63 bits per
  BIGINT word (the sign bit is never used, so the packing is identical
  two's-complement-free integer arithmetic in ANY engine — the same
  trick as sources/layout.py's Z-order key) via a literal
  shiftleft/sum expression tree inside whole-stage codegen.
- **search**: Hamming = Σ bit_count(xor(word_a, word_b)) over the word
  arrays (zip_with + aggregate, still codegen), shortlist top
  ``rescore`` by (hamming, id), then exact-metric re-rank — the same
  late-materialization shape as the PQ path.

The whole operator is expressible in portable SQL, so the oracle
replays it EXACTLY (q_bq_knn) — no recall hand-waving at gate scale.

Scale: the signature is a map-only projection (write it next to the
vectors once); the shortlist scan reads words-per-row bytes and merges
via TakeOrderedAndProject; the rescore touches ``rescore`` rows.
Composes with IVF partitioning like PQ does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import distance_for_metric

__all__ = ["binary_signature", "hamming_distance", "bq_knn", "bq_signature_sql"]

_BITS = 63  # bits packed per BIGINT word; bit 63 (sign) never used


def binary_signature(vec, dims: int) -> Column:
    """array<bigint> of ceil(dims/63) words; bit b of word w is set iff
    vec[63w + b] > 0. Pure Column arithmetic — codegen, no UDF."""
    if dims <= 0:
        raise ValueError("dims must be positive")
    c = F.col(vec) if isinstance(vec, str) else vec
    words = []
    for w in range(0, dims, _BITS):
        terms = None
        for b in range(w, min(w + _BITS, dims)):
            bit = F.shiftleft(
                (c[b] > 0).cast("bigint"), b - w
            )
            terms = bit if terms is None else terms + bit
        words.append(terms)
    return F.array(*words)


def hamming_distance(a: Column, b: Column) -> Column:
    """Σ bit_count(a_w XOR b_w) over two equal-length word arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def bq_knn(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec,
    k: int,
    rescore: int | None = None,
    metric: str = "l2sq",
    dist_col: str = "dist",
) -> DataFrame:
    """Top-k by 1-bit Hamming shortlist + exact rescore.

    Shortlist = top ``rescore`` (default 10·k) rows by
    (hamming-to-query, id) over the sign signatures; the exact
    SQL-visible metric then re-ranks the shortlist and the top ``k``
    come back as (id_col, dist_col). ``rescore=0`` returns the raw
    Hamming shortlist of size k as (id_col, ``hamming``)."""
    q = [float(x) for x in query_vec]
    dims = len(q)
    take = int(rescore) if rescore is not None else 10 * int(k)
    qsig = [
        sum(
            (1 << (b - w)) for b in range(w, min(w + _BITS, dims)) if q[b] > 0
        )
        for w in range(0, dims, _BITS)
    ]
    base = df.where(F.col(vec_col).isNotNull())
    sig = binary_signature(vec_col, dims)
    qcol = F.array(*[F.lit(x).cast("bigint") for x in qsig])
    hd = hamming_distance(sig, qcol)
    if take <= 0:
        return (
            base.select(id_col, hd.alias("hamming"))
            .orderBy(F.col("hamming").asc_nulls_last(), F.col(id_col))
            .limit(int(k))
        )
    cand = (
        base.select(id_col, vec_col, hd.alias("hamming"))
        .orderBy(F.col("hamming").asc_nulls_last(), F.col(id_col))
        .limit(take)
    )
    dist_fn = distance_for_metric(metric)
    return (
        cand.withColumn(dist_col, dist_fn(F.col(vec_col), q))
        .orderBy(F.col(dist_col).asc_nulls_last(), F.col(id_col))
        .limit(int(k))
        .select(id_col, dist_col)
    )


def bq_signature_sql(vec_expr: str, dims: int) -> list[str]:
    """The identical per-word signature as portable SQL (DuckDB/ANSI) —
    for oracle comparison; returns one expression per word."""
    out = []
    for w in range(0, dims, _BITS):
        terms = " + ".join(
            f"(CASE WHEN ({vec_expr})[{b + 1}] > 0 THEN {1 << (b - w)} ELSE 0 END)"
            for b in range(w, min(w + _BITS, dims))
        )
        out.append(f"CAST({terms} AS BIGINT)")
    return out
