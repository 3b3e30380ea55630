"""Table loading & registration for the driver's TPC-H-ish testdata.

The reference reads tables through DuckDB's catalog (``query_table`` in
its SQL macros, src/hnsw/hnsw_index_macros.cpp:16,43,72); our equivalent
is parquet-backed DataFrames registered as temp views so both the
DataFrame API and ``spark.sql`` can address them by name.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def events_ts_unit(path: str) -> str:
    """Physical unit of the events table's ``ts`` column, read from the
    parquet footer (pyarrow — no Spark job, no session conf). The
    driver's testdata has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across rounds; every consumer derives the unit
    from the file instead of assuming one."""
    import pyarrow.parquet as pq

    return str(pq.read_schema(path).field("ts").type)  # e.g. 'timestamp[us]'


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and events_ts_unit(path) == "timestamp[ns]":
        # Spark's parquet reader rejects TIMESTAMP(NANOS); read the raw
        # int64 nanos and derive a microsecond timestamp (DuckDB
        # truncates ns→us the same way). The conf only changes how
        # NANOS-typed columns read, so it cannot affect other tables.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        return (
            spark.read.parquet(path)
            .withColumn("ts_ns", F.col("ts"))
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return spark.read.parquet(path)


def register_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    """Load each table and register it as a temp view; returns the dict."""
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
