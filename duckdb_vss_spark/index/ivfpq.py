"""IVFADC: IVF routing × residual product quantization, composed.

The canonical billion-scale ANN layout (Jégou, Douze, Schmid, TPAMI
2011, §IV "IVFADC"): a coarse quantizer routes each vector to an
inverted list, and PQ encodes the RESIDUAL (x − centroid of its list)
rather than the raw vector. Residuals concentrate near the origin, so
the same code budget quantizes them with far less distortion than raw
coordinates — IVFADC recall at a given m beats flat PQ's.

Spark realization — the two scale levers compose mechanically:

- the inverted lists are parquet partitions (``partitionBy(list_id)``,
  exactly like index/ivf.py), so probing nprobe lists is partition
  pruning the scan provably performs;
- each partition stores (id, m-byte residual code): the pruned scan
  reads nprobe/nlist of the ROWS at m bytes per ROW — the two
  reductions multiply;
- search builds one LUT per PROBED list (the ADC tables of q − c_list;
  nprobe·m·ksub doubles — KBs riding the task closure), scores each
  Arrow batch group-wise by list_id, and merges via
  TakeOrderedAndProject; optional exact re-rank joins the top-R ids
  back to the original vectors (late materialization).

Build = two driver-sized trainings (centroids, then residual
codebooks over the same sample) + ONE map-only assign-and-encode
Arrow stage + one partitioned write: the IVF build plan with a
different payload column.

Metrics: l2sq and cosine (residuals taken on the unit sphere, like
the IVF spherical quantizer). ``ip`` is rejected — inner-product
residuals have no distance-LUT decomposition (the standard MIPS
augmentation changes the geometry; out of scope as in ivf.py's note).
"""

from __future__ import annotations

import json
import logging
import math
import os
import shutil
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StructField,
    StructType,
)

from duckdb_vss_spark.functions.distance import distance_for_metric
from duckdb_vss_spark.index.ivf import _kmeans, _norm_rows
from duckdb_vss_spark.index.pq import _encode_batch, train_pq_codebooks

__all__ = ["create_ivfpq_index", "load_ivfpq_index", "drop_ivfpq_index", "IvfPqIndex"]

_LOG = logging.getLogger(__name__)


def _assign_encode_udf(centroids: np.ndarray, books: np.ndarray, metric: str):
    """One Arrow pass: nearest-centroid assignment + residual PQ encode.
    Returns struct(list_id int, pq_code binary)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    c = centroids.astype(np.float64)
    c_sq = (c**2).sum(axis=1)
    out_t = StructType(
        [
            StructField("list_id", IntegerType()),
            StructField("pq_code", BinaryType()),
        ]
    )

    def enc(v):
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        mat = _norm_rows(mat, metric)
        dist = (mat**2).sum(axis=1, keepdims=True) + c_sq - 2.0 * mat @ c.T
        assign = dist.argmin(axis=1)
        resid = mat - c[assign]
        codes = _encode_batch(resid, books)
        return pd.DataFrame(
            {
                "list_id": assign.astype(np.int32),
                "pq_code": [x.tobytes() for x in codes],
            }
        )

    return pandas_udf(enc, out_t)


class IvfPqIndex:
    """Handle over a built IVFADC artifact."""

    def __init__(self, spark: SparkSession, path: str, manifest: dict):
        self.spark = spark
        self.path = path
        self.manifest = manifest
        self._centroids = np.asarray(manifest["centroids"], dtype=np.float64)
        self._books = np.asarray(manifest["codebooks"], dtype=np.float64)

    @property
    def metric(self) -> str:
        return self.manifest["metric"]

    @property
    def nlist(self) -> int:
        return self.manifest["nlist"]

    @property
    def m(self) -> int:
        return self.manifest["m"]

    @property
    def dims(self) -> int:
        return self.manifest["dimensions"]

    def _codes_df(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "codes"))

    def knn_search(
        self,
        query_vec,
        k: int,
        nprobe: int | None = None,
        rerank: int | None = None,
        source: DataFrame | None = None,
        dist_col: str = "dist",
    ) -> DataFrame:
        """Probe nprobe lists (partition pruning), ADC-score their
        residual codes against per-list LUTs of (q − c_list), merge
        top-k; optional exact re-rank against ``source``."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType

        q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
        if q.shape[0] != self.dims:
            raise ValueError(f"IVFPQ index keys must be of type FLOAT[{self.dims}]")
        qn = _norm_rows(q[None, :], self.metric)[0]
        nprobe = int(nprobe or self.manifest["default_nprobe"])
        cd = ((self._centroids - qn) ** 2).sum(axis=1)
        probes = [int(i) for i in np.argsort(cd, kind="stable")[:nprobe]]

        # per-probed-list ADC tables of the query residual; the constant
        # ||q - c||-independent decomposition: d(q, c + r̂) =
        # ||q - c||² + 2(c - q)·r̂ + ||r̂||², all of which folds into a
        # per-(list, code) LUT entry computed directly from q - c.
        m, ksub, dsub = self._books.shape
        luts = np.empty((len(probes), m, ksub), dtype=np.float64)
        for pi, lid in enumerate(probes):
            r = qn - self._centroids[lid]
            for j in range(m):
                rs = r[j * dsub : (j + 1) * dsub]
                luts[pi, j] = ((self._books[j] - rs) ** 2).sum(axis=1)
        pos = {lid: pi for pi, lid in enumerate(probes)}

        def adc(list_ids, codes):
            arr = np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(len(codes), m)
            pidx = np.array([pos[int(x)] for x in list_ids], dtype=np.int64)
            lut_rows = luts[pidx]  # (n, m, ksub)
            return pd.Series(
                lut_rows[np.arange(len(arr))[:, None], np.arange(m), arr].sum(axis=1)
            )

        adc_udf = pandas_udf(adc, DoubleType())
        id_col = self.manifest["id_col"]
        cand = (
            self._codes_df()
            .where(F.col("list_id").isin(probes))
            .withColumn(dist_col, adc_udf(F.col("list_id"), F.col("pq_code")))
            .orderBy(F.col(dist_col).asc_nulls_last(), F.col(id_col))
            .limit(int(rerank) if rerank else int(k))
            .select(id_col, dist_col)
        )
        if not rerank:
            return cand
        if source is None:
            raise ValueError("rerank requires the source DataFrame with original vectors")
        vec_col = self.manifest["vec_col"]
        dist_fn = distance_for_metric(self.metric)
        return (
            source.join(F.broadcast(cand.drop(dist_col)), id_col)
            .withColumn(dist_col, dist_fn(F.col(vec_col), [float(x) for x in q]))
            .orderBy(F.col(dist_col).asc_nulls_last(), F.col(id_col))
            .limit(int(k))
            .drop(vec_col)
        )


    def knn_join(
        self,
        queries: DataFrame,
        query_vec_col: str,
        k: int,
        query_id_col: str,
        nprobe: int | None = None,
        rerank: int | None = None,
        source: DataFrame | None = None,
        dist_col: str = "dist",
        rn_col: str = "rn",
    ) -> DataFrame:
        """Batched multi-query IVFADC: queries broadcast as a raw
        (Q, dims) matrix; the scan prunes to the UNION of all probed
        lists; each worker lazily builds the (query, probed-list)
        residual LUTs it needs (≤ Q·nprobe·m·ksub doubles, computed
        once per worker) and scores every pruned Arrow batch against
        exactly the queries probing that batch's list. Per-query
        window top-k after one skinny (qid, id, dist) shuffle;
        optional exact re-rank against ``source``.

        Same broadcast-queries regime as PqIndex.knn_join (Q ≲ 10⁵
        per call); larger query sets chunk at the caller."""
        import pandas as pd
        from pyspark.sql import Window
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField as SF_, StructType as ST_

        books, metric, m = self._books, self.metric, self.m
        cents = self._centroids
        nprobe = int(nprobe or self.manifest["default_nprobe"])
        id_col = self.manifest["id_col"]
        qrows = queries.select(query_id_col, query_vec_col).where(
            F.col(query_vec_col).isNotNull()
        )
        qdata = qrows.collect()
        qids = np.asarray([r[0] for r in qdata], dtype=np.int64)
        qmat = _norm_rows(
            np.stack([np.asarray(r[1], dtype=np.float64) for r in qdata]), metric
        )
        cd = (
            (qmat**2).sum(axis=1, keepdims=True)
            + (cents**2).sum(axis=1)
            - 2.0 * qmat @ cents.T
        )
        probes = np.argsort(cd, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
        union = sorted({int(x) for x in probes.ravel()})
        # per-list -> probing query indices (broadcast via closure)
        by_list: dict[int, np.ndarray] = {}
        for qi in range(len(qids)):
            for lid in probes[qi]:
                by_list.setdefault(int(lid), []).append(qi)
        by_list = {lid: np.asarray(v, dtype=np.int64) for lid, v in by_list.items()}
        _, ksub, dsub = books.shape
        cache: dict[tuple[int, int], np.ndarray] = {}

        def _lut(qi: int, lid: int) -> np.ndarray:
            key = (qi, lid)
            lut = cache.get(key)
            if lut is None:
                r = qmat[qi] - cents[lid]
                lut = np.empty((m, ksub), dtype=np.float64)
                for j in range(m):
                    rs = r[j * dsub : (j + 1) * dsub]
                    lut[j] = ((books[j] - rs) ** 2).sum(axis=1)
                cache[key] = lut
            return lut

        out_t = ArrayType(
            ST_([SF_("qid", LongType()), SF_(dist_col, DoubleType())])
        )

        def score(list_ids, codes):
            arr = np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(len(codes), m)
            lids = np.asarray(list_ids, dtype=np.int64)
            out = [None] * len(arr)
            for lid in np.unique(lids):
                rows = np.nonzero(lids == lid)[0]
                qs = by_list.get(int(lid))
                sub = arr[rows]
                dists = np.stack(
                    [
                        _lut(int(qi), int(lid))[np.arange(m), sub].sum(axis=1)
                        for qi in qs
                    ]
                )  # (|qs|, |rows|)
                qv = qids[qs]
                for ri, row in enumerate(rows):
                    out[row] = [
                        (int(qv[x]), float(dists[x, ri])) for x in range(len(qs))
                    ]
            return pd.Series(out)

        score_udf = pandas_udf(score, out_t)
        scored = (
            self._codes_df()
            .where(F.col("list_id").isin(union))
            .withColumn("_s", score_udf(F.col("list_id"), F.col("pq_code")))
            .select(id_col, F.explode("_s").alias("_e"))
            .select(
                id_col,
                F.col("_e.qid").alias(query_id_col),
                F.col(f"_e.{dist_col}").alias(dist_col),
            )
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col(dist_col).asc_nulls_last(), F.col(id_col)
        )
        take = int(rerank) if rerank else int(k)
        cand = (
            scored.withColumn(rn_col, F.row_number().over(w))
            .where(F.col(rn_col) <= take)
        )
        if not rerank:
            return cand
        if source is None:
            raise ValueError("rerank requires the source DataFrame with original vectors")
        vec_col = self.manifest["vec_col"]
        dist_fn = distance_for_metric(metric)
        qvecs = qrows.withColumnRenamed(query_vec_col, "_qvec")
        return (
            source.join(F.broadcast(cand.select(query_id_col, id_col)), id_col)
            .join(F.broadcast(qvecs), query_id_col)
            .withColumn(dist_col, dist_fn(F.col(vec_col), F.col("_qvec")))
            .withColumn(rn_col, F.row_number().over(w))
            .where(F.col(rn_col) <= int(k))
            .drop(vec_col, "_qvec")
        )


def create_ivfpq_index(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    name: str = "ivfpq_idx",
    metric: str = "l2sq",
    nlist: int | None = None,
    default_nprobe: int | None = None,
    m: int = 8,
    ksub: int = 16,
    sample_per_list: int = 256,
    kmeans_iters: int = 10,
    seed: int = 42,
    overwrite: bool = False,
) -> IvfPqIndex:
    """Train coarse centroids + residual codebooks on one driver-sized
    sample, then ONE map-only assign-and-encode stage and one
    ``partitionBy(list_id)`` write."""
    if metric not in ("l2sq", "cosine"):
        raise ValueError("IVFPQ 'metric' must be 'l2sq' or 'cosine' (no 'ip' residuals)")
    if ksub > 256:
        raise ValueError("ksub must be <= 256 (codes are one byte per subspace)")
    from duckdb_vss_spark.session import check_persistence_enabled

    check_persistence_enabled(spark)
    src = df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(vec_col).alias(vec_col)
    ).where(F.col(vec_col).isNotNull())
    total = src.count()
    if total == 0:
        raise ValueError("cannot build an IVFPQ index over an empty vector column")
    if nlist is None:
        nlist = max(2, min(4096, int(math.isqrt(total))))
    nlist = int(min(nlist, total))
    if default_nprobe is None:
        default_nprobe = max(1, nlist // 8)
    first = src.select(vec_col).first()
    dims = len(first[0])

    want = max(nlist * sample_per_list, ksub * 4)
    frac = min(1.0, want / total)
    rows = (
        src.select(vec_col).sample(fraction=frac, seed=seed).limit(want).collect()
        if frac < 1.0
        else src.select(vec_col).collect()
    )
    sample = _norm_rows(
        np.stack([np.asarray(r[0], dtype=np.float64) for r in rows]), metric
    )
    centroids = _kmeans(sample, nlist, kmeans_iters, seed)
    # residual codebooks: quantize what the coarse quantizer leaves over
    d = (
        (sample**2).sum(axis=1, keepdims=True)
        + (centroids**2).sum(axis=1)
        - 2.0 * sample @ centroids.T
    )
    resid = sample - centroids[d.argmin(axis=1)]
    books = train_pq_codebooks(resid, m, ksub, kmeans_iters, seed)

    if os.path.exists(path):
        if not overwrite:
            raise ValueError(f"index path {path!r} already exists (use overwrite=True)")
        shutil.rmtree(path)
    os.makedirs(path)

    enc = _assign_encode_udf(centroids, books, metric)(F.col(vec_col))
    codes_dir = os.path.join(path, "codes")
    (
        src.withColumn("_e", enc)
        .select(id_col, F.col("_e.list_id").alias("list_id"), F.col("_e.pq_code").alias("pq_code"))
        .write.partitionBy("list_id")
        .parquet(codes_dir)
    )

    manifest = {
        "index_name": name,
        "vec_col": vec_col,
        "id_col": id_col,
        "metric": metric,
        "dimensions": dims,
        "nlist": nlist,
        "default_nprobe": default_nprobe,
        "m": m,
        "ksub": ksub,
        "count": int(total),
        "centroids": [[float(x) for x in row] for row in centroids],
        "codebooks": [[[float(x) for x in row] for row in book] for book in books],
        "created_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    tmp = os.path.join(path, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return IvfPqIndex(spark, path, manifest)


def load_ivfpq_index(spark: SparkSession, path: str) -> IvfPqIndex:
    with open(os.path.join(path, "manifest.json")) as f:
        return IvfPqIndex(spark, path, json.load(f))


def drop_ivfpq_index(path: str) -> None:
    if os.path.exists(os.path.join(path, "manifest.json")):
        shutil.rmtree(path)
