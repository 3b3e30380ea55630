"""Offline mark-delete shared by the quantized index family (r13 —
extends HnswIndex.delete_batch to PQ / IVF / IVFADC / IVFSQ / BQ, the
same family-wide completion the r12 ``add_batch`` work did for
inserts).

Reference contract: src/hnsw/hnsw_index.cpp:466-482 marks rows deleted
in usearch (``index.remove``) and compaction reclaims the slots; the
deleted rows stop appearing in scans immediately while the physical
storage shrinks only at compaction. The Spark-artifact analogue stores
the deleted ids as a skinny tombstones parquet INSIDE the artifact
directory, committed by the same atomic-manifest ritual every other
maintenance path uses:

- every scan path filters candidates with a broadcast anti-join
  against the tombstones (DataFrame scans) or an executor-side id
  mask (the mapInPandas query streams) — deletes are visible to the
  next query with O(|ids|) write work, no code/signature rewrite;
- ``count`` reports live rows (indexed − deleted), the reference's
  post-delete semantics (hnsw_insert.test);
- re-adding a tombstoned id via ``add_batch`` REVIVES it (the
  tombstone is by id, and the fresh batch row is the data);
- ``compact()`` physically drops tombstoned rows and re-packs the
  accumulated add_batch files (the reference's compaction-after-DML
  contract, hnsw_index_pragmas.cpp:154-190).

Tombstones are maintenance-scale state: searches anti-join against
them per query and the stream masks ride to workers as bounded
arrays, so a large accumulated delete set is the signal to compact —
the same contract HnswIndex.delete_batch documents.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.index.manifest import write_manifest

__all__ = [
    "dead_id_array",
    "filter_dead",
    "live_count",
    "mark_delete",
    "revive",
    "tombstones_df",
]


def tombstones_df(index) -> DataFrame | None:
    """(id) rows marked deleted, or None when there are none."""
    name = index.manifest.get("tombstones_dir")
    if not name or not int(index.manifest.get("deleted_count", 0)):
        return None
    return index.spark.read.parquet(os.path.join(index.path, name))


def dead_id_array(index) -> np.ndarray | None:
    """Sorted int64 ids for the executor-side query-stream masks —
    bounded by the maintenance contract (accumulate only between
    compactions), same shape HnswIndex._tombstone_ids rides to its
    workers."""
    t = tombstones_df(index)
    if t is None:
        return None
    id_col = index.manifest["id_col"]
    return np.sort(
        np.fromiter(
            (r[0] for r in t.select(id_col).collect()), dtype=np.int64
        )
    )


def filter_dead(index, df: DataFrame, id_col: str | None = None) -> DataFrame:
    """Drop tombstoned rows from a candidate scan: broadcast left-anti
    join (the tombstone side is maintenance-bounded). No-op when the
    artifact has no tombstones, so clean indexes keep their exact
    pre-delete plans."""
    t = tombstones_df(index)
    if t is None:
        return df
    man_id = index.manifest["id_col"]
    col = id_col or man_id
    return df.join(
        F.broadcast(t.select(F.col(man_id).alias(col))), col, "left_anti"
    )


def mask_dead(ids: np.ndarray, rows: np.ndarray, dead: np.ndarray | None):
    """Worker-side twin of filter_dead for the mapInPandas query
    streams: drop the rows whose id is tombstoned. ``dead`` is the
    sorted array from dead_id_array (searchsorted-friendly)."""
    if dead is None or not len(dead):
        return ids, rows
    keep = ~np.isin(ids, dead, assume_unique=False)
    return ids[keep], rows[keep]


def live_count(manifest: dict) -> int:
    """Indexed minus tombstoned — the reference's post-delete count."""
    return int(manifest["count"]) - int(manifest.get("deleted_count", 0))


def mark_delete(index, ids, keys_df: DataFrame, manifest_extra: dict | None = None):
    """The shared delete_batch body: tombstone ``ids`` in ``index``'s
    artifact. ``keys_df`` is the family's live id listing (a skinny
    column-pruned scan of its codes/sigs/lists) — only ids the index
    actually holds are marked, so delete-of-missing and double-delete
    are no-ops (DML DELETE semantics). Cost: the tombstone write is
    O(|ids| + |tombstones|), plus ONE id-column index scan for the
    membership check — the same cost class as a single query over the
    artifact (column-pruned parquet for the quantized families;
    worker-LRU-cached graphs for HNSW). No data file is rewritten. Returns ``index`` with the manifest
    updated in place (atomic write, old tombstone dir swept after)."""
    man = index.manifest
    id_col = man["id_col"]
    if isinstance(ids, DataFrame):
        col = id_col if id_col in ids.columns else ids.columns[0]
        ids_df = ids.select(F.col(col).cast("long").alias(id_col))
    else:
        ids_df = index.spark.createDataFrame(
            [(int(x),) for x in ids], f"{id_col} long"
        )
    ids_df = ids_df.where(F.col(id_col).isNotNull()).distinct()
    present = ids_df.join(
        keys_df.select(id_col).distinct(), id_col, "left_semi"
    )
    old = tombstones_df(index)
    merged_ids = (
        present
        if old is None
        else old.select(id_col).unionByName(present).distinct()
    )
    name = f"tombstones-{uuid.uuid4().hex[:12]}"
    merged_ids.write.parquet(os.path.join(index.path, name))
    n_dead = index.spark.read.parquet(os.path.join(index.path, name)).count()
    merged = dict(man)
    old_dir = merged.get("tombstones_dir")
    merged["tombstones_dir"] = name
    merged["deleted_count"] = int(n_dead)
    if manifest_extra:
        # e.g. streaming replay stamps — ride the SAME atomic commit
        merged.update(manifest_extra)
    merged["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    write_manifest(index.path, merged)
    index.manifest = merged
    if old_dir and old_dir != name:
        shutil.rmtree(os.path.join(index.path, old_dir), ignore_errors=True)
    return index


def revive(index, batch_ids_df: DataFrame, merged: dict) -> str | None:
    """add_batch revive semantics (mirrors HnswIndex.add_batch's
    tombstone merge): drop the incoming batch's ids from the tombstone
    set so a re-added id is live again. Mutates ``merged`` (the
    manifest the caller is about to write atomically — the revive
    rides the SAME commit as the count bump) and returns the OLD
    tombstone dir for the caller to sweep AFTER its write_manifest, or
    None when there was nothing to revive."""
    man = index.manifest
    if not int(man.get("deleted_count", 0)):
        return None
    id_col = man["id_col"]
    remaining = tombstones_df(index).select(id_col).join(
        batch_ids_df.select(id_col).distinct(), id_col, "left_anti"
    )
    name = f"tombstones-{uuid.uuid4().hex[:12]}"
    remaining.write.parquet(os.path.join(index.path, name))
    n_dead = index.spark.read.parquet(os.path.join(index.path, name)).count()
    old_dir = man.get("tombstones_dir")
    if n_dead:
        merged["tombstones_dir"] = name
        merged["deleted_count"] = int(n_dead)
    else:
        shutil.rmtree(os.path.join(index.path, name), ignore_errors=True)
        merged.pop("tombstones_dir", None)
        merged.pop("deleted_count", None)
        name = None
    return old_dir if old_dir != name else None


def compact_data(
    index,
    subdir: str,
    partition_by: str | None = None,
    rows_per_file: int = 65_536,
) -> DataFrame | None:
    """Physically reclaim an artifact's data dir: read it back, drop
    tombstoned rows, re-pack the accumulated add_batch part files
    (right-sized for flat layouts; one file per list for hive layouts
    so probes read one file instead of one-per-epoch), and swap the
    rewritten dir into place. Returns the compacted rows as a
    DataFrame over the NEW files (for per-list recounts), or None when
    there was nothing to do (no tombstones and nothing to coalesce).

    The caller owns the manifest commit (count := live, tombstone
    fields cleared) — call ``finish_compact`` right after. Crash
    safety (ADVICE r13 — the old rmtree-then-rename window could lose
    the whole data dir): the rewrite lands in a hidden staging dir,
    then the old data dir is PARKED at a ``.__old__`` sibling across
    the stage's rename-in, and the parked copy is removed only after
    the swap — every crash point leaves either the old data (possibly
    under the parked name, restored on the next compact_data call
    because the manifest still references the pre-compact state) or
    the complete new data, never neither. Compaction is offline
    maintenance, same contract as the reference's PRAGMA."""
    data_dir = os.path.join(index.path, subdir)
    parked = data_dir.rstrip("/") + ".__old__"
    if not os.path.isdir(data_dir) and os.path.isdir(parked):
        # a previous compaction crashed between parking the old dir and
        # renaming the stage in — the manifest was never updated, so the
        # PARKED (old) copy is the consistent state: restore it
        os.rename(parked, data_dir)
    # sweep orphans from previously-crashed compactions of THIS artifact
    # (the restore above runs FIRST — a stage dir is only garbage once
    # the live data dir is accounted for)
    for nm in os.listdir(index.path):
        if nm.startswith(".compact-"):
            shutil.rmtree(os.path.join(index.path, nm), ignore_errors=True)
    shutil.rmtree(parked, ignore_errors=True)  # crash after rename-in
    # no-op guard (review r13): with zero tombstones and an already
    # right-sized layout there is no state change to buy, so do not
    # pay the O(corpus) rewrite or enter its crash window at all
    if not int(index.manifest.get("deleted_count", 0)):
        n_files = sum(
            1
            for _root, _dirs, names in os.walk(data_dir)
            for nm in names
            if nm.endswith(".parquet")
        )
        if partition_by:
            floor = int(index.manifest.get("nlist", 1))
        else:
            floor = max(1, -(-live_count(index.manifest) // rows_per_file))
        if n_files <= floor:
            return None
    df = index.spark.read.parquet(data_dir)
    df = filter_dead(index, df)
    if partition_by:
        out = df.repartition(F.col(partition_by))
        writer = out.write.partitionBy(partition_by)
    else:
        n_files = max(1, -(-live_count(index.manifest) // rows_per_file))
        out = df.repartition(n_files)
        writer = out.write
    stage = os.path.join(index.path, f".compact-{uuid.uuid4().hex[:12]}")
    writer.parquet(stage)
    # park-then-swap (ADVICE r13): old data survives every crash point
    os.rename(data_dir, parked)
    os.rename(stage, data_dir)
    shutil.rmtree(parked, ignore_errors=True)
    return index.spark.read.parquet(data_dir)


def finish_compact(
    index, new_count: int | None = None, extra: dict | None = None
) -> None:
    """Commit a compaction: count := the EXACT rewritten row count
    (``new_count`` — callers count the compacted files; live_count is
    only the fallback because deleting an id kills EVERY row carrying
    it, so with duplicate re-appended ids the id-based arithmetic
    undercounts the reclaim), tombstone bookkeeping cleared, ``extra``
    manifest fields (e.g. recomputed per-list stats) merged — one
    atomic write, then the tombstone dir sweeps."""
    man = index.manifest
    merged = dict(man)
    merged["count"] = int(new_count) if new_count is not None else live_count(man)
    old_dir = merged.pop("tombstones_dir", None)
    merged.pop("deleted_count", None)
    if extra:
        merged.update(extra)
    merged["updated_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    write_manifest(index.path, merged)
    index.manifest = merged
    if old_dir:
        shutil.rmtree(os.path.join(index.path, old_dir), ignore_errors=True)
