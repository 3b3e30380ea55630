"""Z-order (Morton) data layout — multi-dimensional clustering for
file skipping. Sorting a 100 TB table by a Z-order key before writing
makes parquet row-group min/max statistics selective on EVERY
interleaved column at once, so filters on (user_id), (ts), or both
prune files — the layout optimization Delta/Iceberg expose as
`OPTIMIZE ZORDER BY`, built here from plain column expressions.

The key interleaves the top ``bits`` of each column's value (bit i of
column j lands at position i·ncols + j). All bit math is integer
Column arithmetic — whole-stage codegen, no UDF — and identical
integer SQL reproduces the key in any engine (the oracle pins it).

Use ``zorder_write`` for the end-to-end path:
``df.repartitionByRange(zkey).sortWithinPartitions(zkey).write`` —
one range shuffle, then each task writes locally-clustered files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "zorder_write",
    "widen_narrow_scan",
    "input_bytes",
    "input_uncompressed_bytes",
    "collect_gate_bytes",
]


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each (non-negative
    integer) column into one BIGINT sort key. ncols·bits must fit 63
    bits. Negative or NULL inputs are clamped to 0 (sorted first)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 63:
        raise ValueError("ncols * bits must be <= 63")
    key = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        v = F.greatest(F.coalesce(col.cast("bigint"), F.lit(0)), F.lit(0))
        for i in range(bits):
            bit = F.shiftright(v, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit.cast("bigint"), i * n + j)
            )
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "error",
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-repartition on the key (one shuffle; range bounds keep files
    balanced), sort within each task, drop the key, write. Downstream
    min/max pruning then works for filters on any prefix/subset of
    ``cols``."""
    keyed = df.withColumn("__zkey", zorder_key(cols, bits))
    part = (
        keyed.repartitionByRange(num_files, "__zkey")
        if num_files
        else keyed.repartitionByRange("__zkey")
    )
    part.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(
        path
    )


def zorder_oracle_expr(cols: list[str], bits: int = 16) -> str:
    """The identical key as portable SQL (DuckDB/ANSI bit operators) —
    for oracle comparison."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        v = f"greatest(coalesce(CAST({c} AS BIGINT), 0), 0)"
        for i in range(bits):
            terms.append(f"(((({v}) >> {i}) & 1) << {i * n + j})")
    return " | ".join(terms)


def input_bytes(df: DataFrame) -> int:
    """Best-effort bytes under ``df``'s file scans, from driver-side
    metadata only (no Spark job): sum of ``inputFiles()`` sizes, scaled
    by the analyzed plan's leaf count when a union re-reads the same
    files through several branches (``inputFiles()`` DEDUPES paths — a
    k-branch self-union would otherwise report 1x). Returns -1 when the
    size is unknowable from here (non-file source, remote FS): callers
    choosing between a small-side broadcast and a shuffle should treat
    unknown as LARGE, because at warehouse scale the input that can't
    be stat'd locally is exactly the 100 TB table."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plan
        return -1
    if not files:
        return -1
    import os
    from urllib.parse import unquote, urlparse

    total = 0
    for f in files:
        p = unquote(urlparse(f).path) if "://" in f else f
        try:
            total += os.path.getsize(p)
        except OSError:
            return -1  # remote FS: unknown
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves().size()
    except Exception:  # noqa: BLE001 — py4j surface moved
        leaves = 1
    # ceil, not floor (review r15): union(A, A, B) has 3 file-scan
    # leaves over 2 distinct paths; flooring to 1x let collect gates
    # admit a scan that actually reads some files twice — for a GATE,
    # overestimating is the safe direction
    return total * max(1, -(-leaves // max(1, len(files))))


def input_uncompressed_bytes(df: DataFrame) -> int:
    """UNCOMPRESSED byte estimate under ``df``'s parquet scans, from
    footer metadata only (no Spark job): sum of every row group's
    ``total_byte_size``, leaf-scaled like ``input_bytes``. Returns -1
    when unknowable (non-file source, non-parquet file, remote FS).

    Why it exists (ADVICE r10): compressible columns can decompress to
    far more than their on-disk footprint, so a driver-local
    ``collect()`` gated on COMPRESSED size alone could pull an
    oversized result onto the driver. Gates should bound on
    ``collect_gate_bytes`` = max(compressed, uncompressed). Note the
    bound's honest limit: ``total_byte_size`` is post-ENCODING
    (dictionary/RLE survive it), so it captures the general-purpose
    compression ratio but not dictionary expansion — still strictly
    tighter than the on-disk size the old gate used."""
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 — non-file plan
        return -1
    if not files:
        return -1
    import os
    from urllib.parse import unquote, urlparse

    try:
        import pyarrow.parquet as papq
    except Exception:  # noqa: BLE001
        return -1
    total = 0
    for f in files:
        p = unquote(urlparse(f).path) if "://" in f else f
        if not os.path.exists(p):
            return -1  # remote FS: unknown
        try:
            meta = papq.ParquetFile(p).metadata
        except Exception:  # noqa: BLE001 — not parquet
            return -1
        total += sum(
            meta.row_group(i).total_byte_size for i in range(meta.num_row_groups)
        )
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves().size()
    except Exception:  # noqa: BLE001 — py4j surface moved
        leaves = 1
    # ceil, not floor (review r15): union(A, A, B) has 3 file-scan
    # leaves over 2 distinct paths; flooring to 1x let collect gates
    # admit a scan that actually reads some files twice — for a GATE,
    # overestimating is the safe direction
    return total * max(1, -(-leaves // max(1, len(files))))


# Conservative decompression ratio applied when the on-disk size is
# known but the footer-uncompressed one is not (pyarrow unavailable,
# non-parquet file): snappy/zstd parquet pages typically decompress
# 2-4x; 8x bounds RLE-heavy outliers without making every small CSV
# read "unknown" (ADVICE r11 — max(compressed, -1) silently degraded
# to the compressed-only gate, exactly the hazard the r10 fix closed).
_UNKNOWN_DECOMPRESSION_RATIO = 8


def collect_gate_bytes(df: DataFrame) -> int:
    """The size a driver-local ``collect()`` gate must compare against:
    the LARGER of the on-disk and footer-uncompressed estimates. When
    only the on-disk size is known, it is scaled by a conservative
    decompression ratio instead of being trusted raw (ADVICE r11);
    -1 overall means "unknown, treat as large"."""
    disk = input_bytes(df)
    unc = input_uncompressed_bytes(df)
    if disk >= 0 and unc < 0:
        return disk * _UNKNOWN_DECOMPRESSION_RATIO
    return max(disk, unc)


def widen_narrow_scan(df: DataFrame, key: Column | str | None = None) -> DataFrame:
    """Hash-repartition ``df`` to the cluster's parallelism — but ONLY
    when its file scan is narrower than the cluster.

    Small corpora arrive as one parquet row-group = one scan split, and
    every downstream map stage then runs on a single core; at 100 TB the
    scan already has thousands of splits and this returns ``df``
    untouched (no added shuffle — the condition encodes "the shuffle is
    cheaper than idling the cluster", which flips as data grows).

    The width test reads file sizes from ``inputFiles()`` (~3 ms of
    driver time) instead of ``df.rdd.getNumPartitions()``, which forces
    full analysis + physical planning of a fresh plan (~0.1 s per query
    construction — profiled in r7). Non-file plans (in-memory test
    frames) fall back to the RDD path.

    The probe is union-aware (r7): ``inputFiles()`` DEDUPES paths, so a
    k-branch union re-reading one file reports 1 file while the scan is
    really k partitions wide. Width is therefore ``max(file splits,
    analyzed-plan leaf count)``. This matters beyond the wasted shuffle:
    the round-robin repartition MIXES rows from unrelated corpus slices
    into each task, and the dedup kernels' per-batch memoization
    (shingle → digest) then sees far more UNIQUE shingles per batch —
    measured 10-15x more worker CPU on an already-32-wide union (300-460
    core-s vs 28-31 for byte-identical input). Co-location by source is
    itself a throughput property of memoized kernels; never round-robin
    a text corpus that is already wide.
    """
    sess = df.sparkSession
    target = sess.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        import os
        from urllib.parse import unquote, urlparse

        max_split = 128 * 1024 * 1024  # spark.sql.files.maxPartitionBytes default
        splits = 0
        for f in files:
            p = unquote(urlparse(f).path) if "://" in f else f
            try:
                size = os.path.getsize(p)
            except OSError:
                return df  # unknown layout (remote FS): assume wide
            splits += max(1, -(-size // max_split))
        try:
            leaves = df._jdf.queryExecution().analyzed().collectLeaves().size()
        except Exception:
            leaves = 1
        splits = max(splits, leaves)
    else:
        splits = df.rdd.getNumPartitions()
    if splits >= target:
        return df
    if key is None:
        return df.repartition(target)  # round-robin: even map-side spread
    k = F.col(key) if isinstance(key, str) else key
    return df.repartition(target, k)
