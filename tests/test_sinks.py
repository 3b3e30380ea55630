"""Sink surface: CREATE TABLE AS / INSERT / DELETE / partition overwrite
(the reference's DDL contract on immutable storage, SURVEY §2.2)."""

from pyspark.sql import functions as F

from duckdb_vss_spark.sources.sinks import (
    delete_where,
    insert_into,
    overwrite_where,
    read_table,
    save_table,
)


def test_save_and_read_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t1")
    df = spark.range(100).withColumn("g", F.col("id") % 4)
    save_table(df, p)
    assert read_table(spark, p).count() == 100


def test_partitioned_write_prunes(spark, tmp_path):
    p = str(tmp_path / "t2")
    df = spark.range(100).withColumn("g", (F.col("id") % 4).cast("int"))
    save_table(df, p, partition_by=["g"])
    got = read_table(spark, p).where(F.col("g") == 2)
    assert got.count() == 25
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan  # pruning, not post-filter


def test_insert_into_appends(spark, tmp_path):
    p = str(tmp_path / "t3")
    save_table(spark.range(10), p)
    insert_into(spark.range(10, 15), p)
    got = read_table(spark, p)
    assert got.count() == 15
    assert got.agg(F.max("id")).first()[0] == 14


def test_delete_where(spark, tmp_path):
    p = str(tmp_path / "t4")
    save_table(spark.range(100), p)
    n = delete_where(spark, p, F.col("id") >= 90)
    assert n == 10
    got = read_table(spark, p)
    assert got.count() == 90 and got.agg(F.max("id")).first()[0] == 89


def test_delete_where_null_predicate_keeps_row(spark, tmp_path):
    # DELETE ... WHERE p: rows where p is NULL are NOT deleted (SQL
    # three-valued logic — only TRUE deletes)
    p = str(tmp_path / "t5")
    df = spark.createDataFrame([(1, 5), (2, None), (3, 20)], "id int, x int")
    save_table(df, p)
    n = delete_where(spark, p, F.col("x") > 10)
    assert n == 1
    assert sorted(r["id"] for r in read_table(spark, p).collect()) == [1, 2]


def test_overwrite_where_replaces_only_touched_partitions(spark, tmp_path):
    p = str(tmp_path / "t6")
    df = spark.range(100).withColumn("g", (F.col("id") % 4).cast("int"))
    save_table(df, p, partition_by=["g"])
    patch = (
        spark.range(1000, 1010)
        .withColumn("g", F.lit(2).cast("int"))
    )
    overwrite_where(patch, p, ["g"])
    got = read_table(spark, p)
    assert got.where(F.col("g") == 2).count() == 10  # replaced
    assert got.where(F.col("g") == 1).count() == 25  # untouched
