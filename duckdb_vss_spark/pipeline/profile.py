"""Table profiling — the data-quality pass every ingestion pipeline
runs before training on a new source: per-column row/null/distinct
counts and value ranges, computed in ONE job over ONE scan.

Spark-first shape: the columns unpivot through ``stack`` into
(col_name, value) pairs map-side, then a single groupBy(col_name)
computes every statistic — one shuffle keyed by column NAME (k keys
for k profiled columns, perfectly balanced), instead of the naive
k separate jobs × k scans. The decimal-cast sum keeps the float
accumulation order-independent (oracle-comparable); min/max/distinct
are exact.

At 100 TB: the scan dominates and happens once; the shuffle carries
partial aggregates only (count/min/max/sum collapse map-side). The
exact `count(DISTINCT value)` is the one Θ(distinct) term — swap
``exact_distinct=False`` for approx_count_distinct (HLL, map-side
partial) when profiling ultra-high-cardinality columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_numeric"]


def profile_numeric(
    df: DataFrame, cols: list[str], exact_distinct: bool = True
) -> DataFrame:
    """Profile numeric columns: returns one row per column —
    (col_name, n, n_null, n_distinct, min_v, max_v, sum_v) with values
    compared as doubles."""
    if not cols:
        raise ValueError("cols must be non-empty")
    for c in cols:
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in DataFrame")
    pairs = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (col_name, value)"
    )
    n_distinct = (
        F.count_distinct(F.col("value"))
        if exact_distinct
        else F.approx_count_distinct(F.col("value"))
    )
    return (
        long.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            (F.count(F.lit(1)) - F.count("value")).cast("bigint").alias("n_null"),
            n_distinct.cast("bigint").alias("n_distinct"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.sum(F.col("value").cast("decimal(28,4)")).cast("double").alias("sum_v"),
        )
        .orderBy("col_name")
    )
