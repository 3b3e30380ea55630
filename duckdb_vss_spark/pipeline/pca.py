"""PCA first-component scoring via integer-exact power iteration.

Data-adaptive dimensionality reduction is the other half of the
embedding-compression toolbox (pipeline/corpus.py's JL random
projection is the data-oblivious half): rank corpus vectors along the
leading principal component for curation, sharding and OPQ-style
rotations. The reference has no linear-algebra surface — this is a
north-star pipeline operator (BASELINE.json), built so that EVERY step
replays bit-for-bit in SQL, extending the kmeans trick (integer
quantization makes float-order-dependent sums associative) to an
iterative eigensolver:

1. **Quantized Gram matrix** — one map-only Arrow pass computes the
   per-partition (d×d) sums of ``floor(x_i·x_j·Qg + 0.5)`` (int64),
   reduced by a skinny (cell, sum) shuffle of d² rows per partition:
   vectors never leave their executors, the exchange carries 4096
   BIGINTs per task at d=64. Integer sums are associative, so both
   engines derive the IDENTICAL matrix regardless of partitioning.
2. **Power iteration on the driver** — ``iters`` fixed rounds of
   ``w = G·v``; ``v' = tdiv(w, tdiv(max|w|, Qv) + 1)`` over Python
   ints, where ``tdiv`` is DuckDB's truncating BIGINT ``//``. All
   intermediates are integers: no norm, no sqrt, no float division —
   nothing libm- or order-dependent. d×d work is trivial driver math.
3. **Scoring** — map-only: ``pc1 = Σ_i floor(x_i·Qg + 0.5) · v_i``
   (int64 dot of the quantized row with the integer component).

Overflow bound (documented spec, not a tolerance): with |x| ≤ X and n
rows, |gram| ≤ n·X²·Qg and |w| ≤ d·|gram|·Qv must stay below 2⁶³ —
at the defaults (Qg=10⁶, Qv=2¹³, d=64) that holds to n ≈ 2·10⁵ rows
for unit-scale embeddings; lower Qg for larger corpora (the oracle
takes the same parameter). The SIGN of the component is pinned by the
deterministic all-ones start vector, so scores are a pure function of
(data, Qg, Qv, iters) — the oracle replays all three stages in SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_quantized", "power_component", "pca_power_scores"]


def _tdiv(a: int, b: int) -> int:
    """DuckDB's BIGINT ``//``: truncation toward zero (b > 0)."""
    q = abs(a) // b
    return q if a >= 0 else -q


def gram_quantized(
    df: DataFrame, vec_col: str, dims: int, qg: float = 1_000_000.0
) -> np.ndarray:
    """d×d int64 matrix ``G[i,j] = Σ_rows floor(x_i·x_j·qg + 0.5)``.

    One Arrow map stage emits each task's partial matrix as d² skinny
    (cell, s) rows; a single groupBy reduces them. Bit-exact in any
    engine: the float product/quantize is per-element IEEE arithmetic,
    the sums are integers.
    """
    import pandas as pd

    def partial(batches):
        acc = np.zeros((dims, dims), dtype=np.int64)
        seen = False
        for pdf in batches:
            vs = [v for v in pdf[vec_col] if v is not None]
            if not vs:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
            if x.shape[1] != dims:
                raise ValueError(f"expected {dims}-dim vectors, got {x.shape[1]}")
            prod = x[:, :, None] * x[:, None, :]
            acc += np.floor(prod * qg + 0.5).astype(np.int64).sum(axis=0)
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "cell": np.arange(dims * dims, dtype=np.int64),
                    "s": acc.reshape(-1),
                }
            )

    cells = (
        df.select(vec_col)
        .mapInPandas(partial, schema="cell long, s long")
        .groupBy("cell")
        .agg(F.sum("s").alias("s"))
        .collect()
    )
    g = np.zeros(dims * dims, dtype=np.int64)
    for r in cells:
        g[r["cell"]] = r["s"]
    return g.reshape(dims, dims)


def power_component(gram: np.ndarray, iters: int = 3, qv: int = 8192) -> list[int]:
    """Integer power iteration: the leading-eigenvector direction as a
    length-d int vector with |v| ≤ qv. Pure Python-int arithmetic
    mirroring the SQL replay exactly (truncating division, no floats).
    A zero iterate (degenerate all-zero Gram) stays zero."""
    d = gram.shape[0]
    g = [[int(x) for x in row] for row in gram]
    v = [int(qv)] * d
    for _ in range(int(iters)):
        w = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        scale = _tdiv(mx, qv) + 1
        v = [_tdiv(x, scale) for x in w]
    return v


def pca_power_scores(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dims: int | None = None,
    iters: int = 3,
    qg: float = 1_000_000.0,
    qv: int = 8192,
) -> DataFrame:
    """Per-row leading-principal-component score: (id_col, pc1 BIGINT),
    NULL vectors omitted. ``pc1 = Σ_i floor(x_i·qg + 0.5) · v_i`` with
    ``v`` from ``power_component`` — all integer, hence bit-identical
    in any engine replaying the same spec."""
    import pandas as pd

    src = df.where(F.col(vec_col).isNotNull())
    if dims is None:
        first = src.select(vec_col).first()
        if first is None:
            raise ValueError("cannot infer dimensions: no non-null vectors")
        dims = len(first[0])
    comp = power_component(gram_quantized(src, vec_col, dims, qg), iters, qv)
    varr = np.asarray(comp, dtype=np.int64)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            qx = np.floor(x * qg + 0.5).astype(np.int64)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "pc1": qx @ varr,
                }
            )

    out = src.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        score, schema="id long, pc1 long"
    )
    return out.select(F.col("id").alias(id_col), "pc1")
