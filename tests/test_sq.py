"""Scalar quantization (index/sq.py)."""

import numpy as np
from pyspark.sql import functions as F

from duckdb_vss_spark.index import sq_encode, sq_knn, sq_reconstruct, train_sq

SF = "/root/testdata/sf0.001"


def test_sq_roundtrip_error_bound(spark):
    from duckdb_vss_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    mins, maxs = train_sq(emb, "embedding")
    enc = sq_encode(emb, "embedding", mins, maxs)
    rows = (
        enc.select(
            F.col("embedding").cast("array<double>").alias("v"),
            sq_reconstruct(F.col("codes"), mins, maxs).alias("r"),
            "codes",
        )
        .limit(200)
        .collect()
    )
    step = (maxs - mins) / 255.0
    for row in rows:
        v, r = np.asarray(row["v"]), np.asarray(row["r"])
        assert all(0 <= c <= 255 for c in row["codes"])
        # reconstruction error <= half a quantization step per dim
        assert np.all(np.abs(v - r) <= step / 2 + 1e-12)


def test_sq_knn_close_to_exact(spark):
    from duckdb_vss_spark.functions.distance import array_distance
    from duckdb_vss_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    q = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    approx = [r["vec_id"] for r in sq_knn(emb, "embedding", "vec_id", q, 10).collect()]
    qlit = F.from_json(
        F.lit("[" + ",".join(repr(x) for x in q) + "]"), "array<double>"
    )
    exact = [
        r["vec_id"]
        for r in emb.where(F.col("embedding").isNotNull())
        .select("vec_id", array_distance(F.col("embedding").cast("array<double>"), qlit).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    # 8-bit quantization on 64 dims: near-perfect top-10 agreement;
    # the query itself (vec_id=3) must rank first in both
    assert approx[0] == exact[0] == 3
    assert len(set(approx) & set(exact)) >= 8
