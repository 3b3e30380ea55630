"""As-of join: for each left row, attach the single right row that is
nearest in the ordering column under an inequality — the backbone of
event-stream enrichment (match each event to the latest prior state,
price, login, error, ...).

DuckDB ships this as `ASOF JOIN` (a dedicated physical operator);
Spark has no built-in. The naive translations are both wrong at scale:
an inequality join plans as BroadcastNestedLoop/cartesian, and a
"join then keep max" materializes every (left, earlier-right) pair —
O(n·m) within each key. The Spark-native shape used here is the
union-merge idiom (the same one Flint/pandas `merge_asof` distribute):

1. tag right rows side=0 and left rows side=1, union them on a common
   schema (right payload packed into ONE struct so a match can never
   tear across columns);
2. ONE shuffle on the `by` keys, sort within partition by
   (on, side) — at equal `on` the right row sorts first, giving the
   inclusive (right.on <= left.on) semantics of DuckDB's
   `ASOF JOIN ... ON l.ts >= r.ts`;
3. a running `last(struct, ignorenulls)` window carries the most
   recent right row forward; left rows read their match in O(1).

Total cost: one hash shuffle + one sort-merge pass, independent of how
many left rows share a match — the plan a 100 TB event table needs.
Left rows with no match keep NULLs (ASOF LEFT JOIN semantics).

Reference parity: DuckDB ASOF JOIN (the reference engine's core
surface); semantics pinned by the q_asof_join oracle, which runs the
real `ASOF LEFT JOIN` SQL against the same parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]

_TIME_TYPES = {"timestamp", "timestamp_ntz", "date"}


def _gap_expr(left_on: Column, right_on: Column, dtype: str) -> Column:
    """left_on - right_on as a number (microseconds for time types)."""
    if dtype in _TIME_TYPES:
        return F.unix_micros(left_on.cast("timestamp")) - F.unix_micros(
            right_on.cast("timestamp")
        )
    return left_on - right_on


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """ASOF LEFT JOIN `left` to `right`.

    Parameters
    ----------
    on: ordering column present in both sides (timestamp or numeric).
    by: optional equality key(s); the shuffle key. Without `by` the
        window is global (single partition) — fine for small frames,
        use a `by` key at scale.
    right_cols: right columns to attach (default: all but on/by).
        Attached under their own name, or name+suffix on collision
        with a left column. The matched right `on` value is always
        attached as ``f"{on}{suffix}"``.
    direction: "backward" (greatest right.on <= left.on — DuckDB's
        `l.on >= r.on`) or "forward" (least right.on >= left.on).
    tolerance: max allowed |left.on - right.on| (microseconds for
        time types, plain difference for numerics); matches farther
        away are nulled out, the left row is kept.

    When several right rows tie exactly on (by, on), the one latest in
    the (deterministic) sort by the packed payload struct wins; with
    unique (by, on) on the right — the common case — the join is fully
    deterministic.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by_list = [by] if isinstance(by, str) else list(by or [])
    for c in (on, *by_list):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} must exist on both sides")
    carried = right_cols or [c for c in right.columns if c not in {on, *by_list}]
    for c in carried:
        if c not in right.columns:
            raise ValueError(f"right_cols entry {c!r} not in right side")

    on_dtype = dict(right.dtypes)[on]
    # Right payload rides as ONE struct: `last(ignorenulls)` then sees
    # a non-null value exactly at right rows, and a match can never mix
    # columns from different right rows (per-column last() could, if a
    # right column were itself NULL).
    payload = F.struct(
        F.col(on).alias("__on"), *[F.col(c).alias(c) for c in carried]
    )
    # SQL ASOF semantics: the inequality is FALSE for NULL ordering
    # values on either side (review r15) — a NULL-on right row must
    # never match (under Spark's nulls-first ASC it sorted to the
    # partition head and became a universal backward fallback), and a
    # NULL-on left row keeps its row with no match (guarded after the
    # window below; under DESC nulls-last it inherited the smallest-on
    # right row in forward mode)
    right = right.where(F.col(on).isNotNull())
    r2 = right.select(
        *by_list,
        F.col(on).alias("__ord"),
        F.lit(0).alias("__side"),
        payload.alias("__match"),
        *[F.lit(None).cast(t).alias(f"__l_{c}") for c, t in left.dtypes],
    )
    l2 = left.select(
        *by_list,
        F.col(on).alias("__ord"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r2.schema["__match"].dataType).alias("__match"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    order = [F.col("__ord").asc(), F.col("__side").asc(), F.col("__match").asc()]
    if direction == "forward":
        order = [F.col("__ord").desc(), F.col("__side").asc(), F.col("__match").desc()]
    w = (
        Window.partitionBy(*[F.col(c) for c in by_list])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = r2.unionByName(l2).withColumn(
        "__match", F.last("__match", ignorenulls=True).over(w)
    )
    u = u.where(F.col("__side") == 1)
    # NULL-on left rows: comparison is false → row kept, match nulled
    u = u.withColumn(
        "__match", F.when(F.col("__ord").isNotNull(), F.col("__match"))
    )

    if tolerance is not None:
        gap = F.abs(_gap_expr(F.col("__ord"), F.col("__match.__on"), on_dtype))
        u = u.withColumn(
            "__match",
            F.when(gap <= F.lit(tolerance), F.col("__match")),
        )

    taken = set(left.columns)
    out = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out.append(
        F.col("__match.__on").alias(
            f"{on}{suffix}" if f"{on}{suffix}" not in taken else f"{on}{suffix}_"
        )
    )
    for c in carried:
        name = c if c not in taken else f"{c}{suffix}"
        out.append(F.col(f"__match.{c}").alias(name))
    return u.select(*out)
