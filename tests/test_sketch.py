"""KMV distinct-count sketch tests (pipeline/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.sketch import kmv_distinct


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [(i % 40,) for i in range(1000)], "v long"
    ).select(F.col("v").cast("string").alias("v"))
    row = kmv_distinct(df, "v", k=64).collect()[0]
    # fewer than k distinct -> the sketch IS the exact count
    assert row["n_seen"] == 40 and row["n_est"] == 40.0


def test_estimate_within_bounds_above_k(spark):
    n = 5000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct(df, "v", k=256).collect()[0]
    assert row["n_seen"] == 256
    # sigma/mu ~ 1/sqrt(k-2) ~ 6.3%; allow 5 sigma
    assert abs(row["n_est"] - n) / n < 0.32


def test_partitioning_invariant_and_duplicates_ignored(spark):
    base = spark.range(3000).select(F.col("id").cast("string").alias("v"))
    dup = base.union(base).union(base)
    a = kmv_distinct(base.repartition(3), "v", k=128).collect()[0]
    b = kmv_distinct(dup.repartition(17), "v", k=128).collect()[0]
    assert a["n_est"] == b["n_est"] and a["n_seen"] == b["n_seen"]


def test_groupwise(spark):
    df = spark.createDataFrame(
        [("a", str(i)) for i in range(30)] + [("b", str(i)) for i in range(500)],
        "g string, v string",
    )
    rows = {r["g"]: r for r in kmv_distinct(df, "v", k=64, group_cols=["g"]).collect()}
    assert rows["a"]["n_est"] == 30.0  # exact below k
    assert rows["b"]["n_seen"] == 64
    assert abs(rows["b"]["n_est"] - 500) / 500 < 0.65  # 5 sigma at k=64


def test_k_validation(spark):
    df = spark.range(5).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", k=1)
