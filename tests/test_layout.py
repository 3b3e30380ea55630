"""Unit tests for Z-order layout (sources/layout.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.sources.layout import zorder_key, zorder_write


def _key(spark, a, b, bits=8):
    df = spark.createDataFrame([(a, b)], "a long, b long")
    return df.select(zorder_key(["a", "b"], bits).alias("k")).first().k


class TestZorderKey:
    def test_interleave_exact(self, spark):
        # a=0b11, b=0b01 -> bits of a at even*2+0? a is col 0: position
        # i*2+0; b col 1: i*2+1 -> key = a0<<0 | b0<<1 | a1<<2 | b1<<3
        assert _key(spark, 0b11, 0b01) == 0b0111
        assert _key(spark, 0, 0) == 0
        assert _key(spark, 1, 0) == 1
        assert _key(spark, 0, 1) == 2

    def test_locality_monotone_on_diagonal(self, spark):
        ks = [_key(spark, v, v) for v in (0, 1, 2, 3)]
        assert ks == sorted(ks) and len(set(ks)) == 4

    def test_null_and_negative_clamp_to_zero(self, spark):
        df = spark.createDataFrame([(None, -5)], "a long, b long")
        assert df.select(zorder_key(["a", "b"], 8).alias("k")).first().k == 0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            zorder_key(["a"], 8)
        with pytest.raises(ValueError):
            zorder_key(["a", "b", "c", "d"], 16)

    def test_write_clusters_row_groups(self, spark, tmp_path):
        # after zorder_write, per-file min/max ranges of both columns
        # are narrower than the global range (the file-skipping effect)
        df = spark.range(4096).select(
            (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
        )
        out = str(tmp_path / "z")
        zorder_write(df, out, ["a", "b"], bits=6, num_files=8)
        import pyarrow.parquet as pq
        import glob

        spans_a = []
        for f in glob.glob(out + "/*.parquet"):
            t = pq.read_table(f)
            a = t.column("a").to_pylist()
            if a:
                spans_a.append(max(a) - min(a))
        assert spans_a and sum(spans_a) / len(spans_a) < 63  # global span is 63


def test_widen_narrow_scan_widens_single_split_parquet(spark, tmp_path):
    """A one-row-group parquet scan (narrower than the cluster) is
    repartitioned up to defaultParallelism; key form hash-partitions,
    keyless form round-robins. Already-wide frames pass through
    untouched (same plan object, no added exchange)."""
    from duckdb_vss_spark.sources.layout import widen_narrow_scan

    p = str(tmp_path / "narrow.parquet")
    spark.range(1000).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism

    wide = widen_narrow_scan(df, "id")
    assert wide.rdd.getNumPartitions() == target
    assert sorted(r["id"] for r in wide.collect()) == list(range(1000))

    rr = widen_narrow_scan(df)
    assert rr.rdd.getNumPartitions() == target

    # in-memory frame that is already at cluster width: untouched
    mem = spark.range(0, 1000, 1, target)
    assert widen_narrow_scan(mem, "id") is mem


def test_widen_narrow_scan_union_already_wide(spark, tmp_path):
    """A k-branch union re-reading one small file is already k tasks
    wide even though inputFiles() dedupes to a single path — the probe
    must count analyzed-plan leaves and pass the frame through. (The
    round-robin repartition it would otherwise insert also MIXES corpus
    slices across tasks, defeating the dedup kernels' per-batch shingle
    memoization — measured 10-15x worker CPU at 32x; see layout.py.)"""
    from functools import reduce

    from pyspark.sql import functions as F

    from duckdb_vss_spark.sources.layout import widen_narrow_scan

    p = str(tmp_path / "one.parquet")
    spark.range(100).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(p)
    base = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    branches = [
        base.select((F.col("id") + i * 1000).alias("id"), "v")
        for i in range(target)
    ]
    union = reduce(lambda a, b: a.unionByName(b), branches)
    assert widen_narrow_scan(union) is union
    assert widen_narrow_scan(union, "id") is union
    # a union still narrower than the cluster is widened
    if target > 2:
        small = reduce(lambda a, b: a.unionByName(b), branches[:2])
        assert widen_narrow_scan(small).rdd.getNumPartitions() == target
