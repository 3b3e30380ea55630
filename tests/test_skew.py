"""Unit tests for the skew-salted join (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key
    fact = spark.createDataFrame(
        [(i, 1 if i < 90 else i % 10, float(i)) for i in range(100)],
        "row_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(10)], "k long, label string"
    )
    return fact, dim


class TestSaltedJoin:
    def test_equals_plain_join(self, skewed):
        fact, dim = skewed
        plain = sorted(
            (r.row_id, r.label) for r in fact.join(dim, "k").collect()
        )
        salted = sorted(
            (r.row_id, r.label)
            for r in salted_join(fact, dim, "k", salts=8).collect()
        )
        assert salted == plain

    def test_left_join_keeps_unmatched(self, spark):
        fact = spark.createDataFrame([(1, 5, 0.0), (2, 99, 0.0)], "row_id long, k long, v double")
        dim = spark.createDataFrame([(5, "x")], "k long, label string")
        got = {r.row_id: r.label for r in salted_join(fact, dim, "k", salts=4, how="left").collect()}
        assert got == {1: "x", 2: None}

    def test_hot_key_spreads_over_salts(self, skewed):
        fact, dim = skewed
        f2 = fact.withColumn(
            "__salt",
            F.pmod(
                F.crc32(
                    F.concat_ws(
                        "\x1f",
                        F.col("k").cast("string"),
                        F.col("row_id").cast("string"),
                    )
                ),
                F.lit(8),
            ),
        )
        hot = f2.where(F.col("k") == 1).select("__salt").distinct().count()
        assert hot >= 4  # 90 rows scatter over most of 8 buckets

    def test_deterministic_across_partitionings(self, skewed):
        fact, dim = skewed
        a = sorted(tuple(r) for r in salted_join(fact, dim, "k", salts=8).collect())
        b = sorted(
            tuple(r)
            for r in salted_join(fact.repartition(17), dim, "k", salts=8).collect()
        )
        assert a == b

    def test_validation(self, skewed):
        fact, dim = skewed
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", salts=0)
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", how="full")
        with pytest.raises(ValueError):
            salted_join(fact, dim, "missing")
