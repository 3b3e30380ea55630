"""Sink surface: the reference's DDL/DML contract on immutable storage.

The reference's tests exercise CREATE TABLE / INSERT / DELETE / DROP /
CHECKPOINT / restart (SURVEY §2.2 Sink/DDL; e.g. reference
test/sql/hnsw/hnsw_crud.test:10-25, hnsw_basic.test:33-38). Spark tables
are immutable files, so the equivalents are snapshot-rewrite operations:

  save_table      CREATE TABLE AS  (partitioned/bucketed parquet write)
  insert_into     INSERT INTO ... SELECT  (append new files)
  delete_where    DELETE FROM ... WHERE   (rewrite surviving rows)
  overwrite_where selective partition overwrite (dynamic mode)

``delete_where`` rewrites only because parquet has no deletion vectors;
at 100 TB you'd put a table format (Delta/Iceberg) under the same call
sites — the API shape is what the engine pins down. All writes commit
atomically per Spark's file-commit protocol; readers see old or new,
never half.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["save_table", "insert_into", "delete_where", "merge_upsert", "overwrite_where", "read_table"]


_FORMATS = ("parquet", "csv", "json")


def save_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    mode: str = "error",
    fmt: str = "parquet",
) -> None:
    """CREATE TABLE AS: parquet write, optionally partitioned (partition
    pruning for downstream filters) or bucketed (co-located joins without
    a shuffle — pre-shuffling once at write time).

    ``fmt`` covers the reference host's other table formats (DuckDB
    reads/writes CSV and JSON natively — read_csv_auto / read_json /
    COPY TO): 'csv' writes headered CSV, 'json' writes JSON Lines;
    both are cross-engine readable (pinned by tests that read the
    Spark-written files back through DuckDB)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        # bucketing requires a metastore table; path-only parquet cannot
        # record bucket metadata, so route through saveAsTable
        name = os.path.basename(path.rstrip("/"))
        w.bucketBy(n, *cols).sortBy(*cols).option("path", path).saveAsTable(name)
        return
    if fmt == "csv":
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    else:
        w.parquet(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    """Read a table directory. CSV needs ``schema`` (or falls back to
    header + inference — fine for exploration, not for contracts)."""
    if fmt not in _FORMATS:
        raise ValueError(f"fmt must be one of {_FORMATS}")
    if fmt == "csv":
        r = spark.read.option("header", "true")
        return r.schema(schema).csv(path) if schema else r.option(
            "inferSchema", "true"
        ).csv(path)
    if fmt == "json":
        return spark.read.schema(schema).json(path) if schema else spark.read.json(path)
    return spark.read.parquet(path)


def insert_into(df: DataFrame, path: str) -> None:
    """INSERT INTO ... SELECT: append files to the table directory."""
    df.write.mode("append").parquet(path)


def delete_where(spark: SparkSession, path: str, predicate: Column) -> int:
    """DELETE FROM t WHERE p: rewrite surviving rows, atomically swap.

    Returns the number of deleted rows. The rewrite goes through a
    sibling temp dir + rename so a crash never leaves a half table.
    """
    df = spark.read.parquet(path)
    total = df.count()
    surviving = df.where(~predicate | predicate.isNull())
    tmp = path.rstrip("/") + ".__rewrite__"
    surviving.write.mode("overwrite").parquet(tmp)
    kept = spark.read.parquet(tmp).count()
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return total - kept


def overwrite_where(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """Dynamic partition overwrite: replaces only the partitions present
    in ``df`` (the scalable 'UPDATE a slice' idiom)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key_cols: list[str]
) -> dict:
    """MERGE (upsert): rows of ``updates`` replace target rows with the
    same key; new keys append — DuckDB's INSERT OR REPLACE / the MERGE
    INTO every table format exposes, as one anti-join + union rewrite
    with the same temp-dir + rename atomicity as delete_where.

    Returns {"updated": n, "inserted": n}. At scale the anti-join is a
    broadcast when ``updates`` is small (AQE decides); for huge
    targets partition the table and route through overwrite_where so
    only touched partitions rewrite.
    """
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    target = spark.read.parquet(path)
    for c in key_cols:
        if c not in target.columns or c not in updates.columns:
            raise ValueError(f"key column {c!r} missing from a side")
    if set(target.columns) != set(updates.columns):
        raise ValueError("updates schema must match target")
    updates = updates.select(*target.columns)
    n_target = target.count()
    n_updates = updates.count()
    survivors = target.join(updates.select(*key_cols), key_cols, "left_anti")
    merged = survivors.unionByName(updates)
    tmp = path.rstrip("/") + ".__rewrite__"
    merged.write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    inserted = n_after - n_target
    return {"updated": n_updates - inserted, "inserted": inserted}


def compact_table(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> dict:
    """Small-file compaction (OPTIMIZE): rewrite a parquet directory
    into ~``target_file_mb``-sized files with the same temp-dir +
    atomic-rename swap as the other maintenance ops.

    The operational counterpart of the streaming sinks: micro-batch
    writers (``streaming_matview``, ``insert_into``) accrete small
    files whose per-file open/footer cost eventually dominates scans.
    File count comes from the CURRENT on-disk byte size (driver-side
    listing, no data job), then one ``coalesce`` rewrite — coalesce,
    not repartition, so compaction itself is shuffle-free. For
    partitioned tables run per partition directory (the same
    bounded-blast-radius argument as overwrite_where).

    Returns {"files_before": n, "files_after": n, "bytes": n}.
    """
    import shutil

    files = [
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(path)
        for f in fn
        if f.endswith(".parquet")
    ]
    if not files:
        raise ValueError(f"no parquet files under {path!r}")
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__compact__"
    df.coalesce(int(n_out)).write.mode("overwrite").parquet(tmp)
    # verify before swapping — a failed rewrite must never eat the table
    n_before = df.count()
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError("compaction row-count mismatch; table untouched")
    shutil.rmtree(path)
    os.rename(tmp, path)
    after = [
        f
        for dp, _dn, fn in os.walk(path)
        for f in fn
        if f.endswith(".parquet")
    ]
    return {"files_before": len(files), "files_after": len(after), "bytes": int(total)}
