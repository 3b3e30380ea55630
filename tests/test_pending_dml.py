"""The pending_dml intent journal (r14, VERDICT r13 #2): a crash
between a table DML's commit and its bound-index update must be
DETECTED (load refuses) and REPLAYABLE (resolve_pending_dml), closing
the per-step-atomic seam vs the reference's single transaction
(src/hnsw/hnsw_index.cpp:391-500). Crashes are simulated with a proxy
index handle that raises at the journaled step."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.index import create_hnsw_index, load_any_index
from duckdb_vss_spark.index.manifest import PendingDmlError, set_pending
from duckdb_vss_spark.sources import sinks


class _Crash(RuntimeError):
    pass


class _CrashingProxy:
    """Forwards everything to the real index; raises at the chosen
    maintenance call — before it runs (after=False, the index never
    updated) or after it committed (after=True, only the journal clear
    is lost)."""

    def __init__(self, inner, crash_on: str, after: bool = False):
        object.__setattr__(self, "_inner", inner)
        object.__setattr__(self, "_crash_on", crash_on)
        object.__setattr__(self, "_after", after)

    @property
    def manifest(self):
        return self._inner.manifest

    @manifest.setter
    def manifest(self, v):
        self._inner.manifest = v

    @property
    def path(self):
        return self._inner.path

    def __getattr__(self, n):
        return getattr(self._inner, n)

    def _maybe_crash(self, name, *a, **k):
        if self._crash_on == name:
            if self._after:
                getattr(self._inner, name)(*a, **k)
            raise _Crash(f"simulated crash at {name}")
        return getattr(self._inner, name)(*a, **k)

    def add_batch(self, *a, **k):
        return self._maybe_crash("add_batch", *a, **k)

    def delete_batch(self, *a, **k):
        return self._maybe_crash("delete_batch", *a, **k)


def _mk(spark, tmp_path, n=24):
    rows = [(i, [float(i), float(i % 5), 1.0, 0.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "rid long, vec array<float>")
    table = str(tmp_path / "t")
    df.write.parquet(table)
    ix = create_hnsw_index(
        spark, df, vec_col="vec", id_col="rid",
        path=str(tmp_path / "ix"), name="pend", metric="l2sq",
        overwrite=True,
    )
    return table, ix


def test_crash_before_index_delete_detected_and_replayed(spark, tmp_path):
    table, ix = _mk(spark, tmp_path)
    proxy = _CrashingProxy(ix, "delete_batch")
    sinks.bind_index(table, proxy)
    try:
        with pytest.raises(_Crash):
            sinks.delete_where(spark, table, F.col("rid") < 4)
    finally:
        sinks.unbind_indexes(table)
    # the table committed (rows gone) but the index never updated
    assert spark.read.parquet(table).count() == 20
    assert ix.count == 24
    with pytest.raises(PendingDmlError, match="delete_where"):
        load_any_index(spark, ix.path)
    assert sinks.resolve_pending_dml(spark, ix.path) == "replayed"
    fresh = load_any_index(spark, ix.path)  # loads clean now
    assert fresh.count == 20
    hits = fresh.knn_search(
        spark.read.parquet(table), [0.0, 0.0, 1.0, 0.0], 5, ef_search=200
    )
    assert all(r["rid"] >= 4 for r in hits.collect())
    assert sinks.resolve_pending_dml(spark, ix.path) == "clean"  # idempotent


def test_crash_after_index_update_is_already_applied(spark, tmp_path):
    table, ix = _mk(spark, tmp_path)
    proxy = _CrashingProxy(ix, "delete_batch", after=True)
    sinks.bind_index(table, proxy)
    try:
        with pytest.raises(_Crash):
            sinks.delete_where(spark, table, F.col("rid") < 4)
    finally:
        sinks.unbind_indexes(table)
    # both table and index updated; only the journal clear was lost
    assert ix.count == 20
    assert sinks.resolve_pending_dml(spark, ix.path) == "already-applied"
    assert load_any_index(spark, ix.path).count == 20


def test_crash_before_index_insert_replays_exact_files(spark, tmp_path):
    table, ix = _mk(spark, tmp_path)
    proxy = _CrashingProxy(ix, "add_batch")
    sinks.bind_index(table, proxy)
    batch = spark.createDataFrame(
        [(100, [9.0, 9.0, 9.0, 9.0]), (101, [8.0, 8.0, 8.0, 8.0])],
        "rid long, vec array<float>",
    )
    try:
        with pytest.raises(_Crash):
            sinks.insert_into(batch, table)
    finally:
        sinks.unbind_indexes(table)
    assert spark.read.parquet(table).count() == 26
    assert ix.count == 24
    with pytest.raises(PendingDmlError, match="insert"):
        load_any_index(spark, ix.path)
    assert sinks.resolve_pending_dml(spark, ix.path) == "replayed"
    fresh = load_any_index(spark, ix.path)
    assert fresh.count == 26
    top = fresh.knn_search(
        spark.read.parquet(table), [9.0, 9.0, 9.0, 9.0], 1, ef_search=200
    ).first()
    assert top["rid"] == 100


def test_pending_before_uncommitted_table_op_is_a_safe_noop(spark, tmp_path):
    """Crash AFTER the journal write but BEFORE the table swap: the
    replay must not delete ids that are still live in the table."""
    table, ix = _mk(spark, tmp_path)
    staged = str(tmp_path / "staged_ids")
    spark.createDataFrame([(0,), (1,)], "rid long").write.parquet(staged)
    ix.manifest = set_pending(
        ix.path, ix.manifest,
        {"op": "delete_where", "table": table, "ids": staged, "token": "tok1"},
    )
    assert sinks.resolve_pending_dml(spark, ix.path) == "replayed"
    fresh = load_any_index(spark, ix.path)
    assert fresh.count == 24  # nothing deleted: rows 0/1 still in table


def test_crash_mid_merge_hook_replays_to_correct_state(spark, tmp_path):
    table, ix = _mk(spark, tmp_path)
    proxy = _CrashingProxy(ix, "add_batch")  # delete+compact run first
    sinks.bind_index(table, proxy)
    updates = spark.createDataFrame(
        [(3, [7.0, 7.0, 7.0, 7.0]), (200, [6.0, 6.0, 6.0, 6.0])],
        "rid long, vec array<float>",
    )
    try:
        with pytest.raises(_Crash):
            sinks.merge_upsert(spark, table, updates, ["rid"])
    finally:
        sinks.unbind_indexes(table)
    with pytest.raises(PendingDmlError, match="merge"):
        load_any_index(spark, ix.path)
    assert sinks.resolve_pending_dml(spark, ix.path) == "replayed"
    fresh = load_any_index(spark, ix.path)
    tbl = spark.read.parquet(table)
    assert fresh.count == tbl.count() == 25  # 24 - 1 updated + 2 upserts... (3 replaced, 200 new)
    top = fresh.knn_search(tbl, [7.0, 7.0, 7.0, 7.0], 1, ef_search=200).first()
    assert top["rid"] == 3  # the UPDATED vector serves, not the old one


def test_hnsw_compact_preserves_pending_record(spark, tmp_path):
    """compact_from_shards rebuilds a fresh manifest — the journal must
    survive it (a compaction between crash and resolve must not erase
    the evidence)."""
    _table, ix = _mk(spark, tmp_path)
    ix.manifest = set_pending(
        ix.path, ix.manifest,
        {"op": "delete_where", "table": "/nope", "ids": None, "token": "t2"},
    )
    ix = ix.compact_from_shards()
    assert ix.manifest.get("pending_dml", {}).get("token") == "t2"
    with pytest.raises(PendingDmlError):
        load_any_index(spark, ix.path)


def test_crash_insert_past_list_cap_replays_via_watermark(
    spark, tmp_path, monkeypatch
):
    """VERDICT r14 #2: past the file-listing cap the journal records a
    (count, max_mtime_ns) watermark and recovery REPLAYS — the capped
    branch no longer raises. Cap forced to 0 so the real table's
    listing exceeds it."""
    monkeypatch.setattr(sinks, "_JOURNAL_LIST_CAP", 0)
    table, ix = _mk(spark, tmp_path)
    proxy = _CrashingProxy(ix, "add_batch")
    sinks.bind_index(table, proxy)
    batch = spark.createDataFrame(
        [(100, [9.0, 9.0, 9.0, 9.0]), (101, [8.0, 8.0, 8.0, 8.0])],
        "rid long, vec array<float>",
    )
    try:
        with pytest.raises(_Crash):
            sinks.insert_into(batch, table)
    finally:
        sinks.unbind_indexes(table)
    assert spark.read.parquet(table).count() == 26
    assert ix.count == 24
    with pytest.raises(PendingDmlError, match="insert"):
        load_any_index(spark, ix.path)
    rec = load_any_index(spark, ix.path, allow_pending=True).manifest[
        "pending_dml"
    ]
    assert rec["files_before"] is None and rec["files_watermark"]["count"] > 0
    assert sinks.resolve_pending_dml(spark, ix.path) == "replayed"
    fresh = load_any_index(spark, ix.path)
    assert fresh.count == 26
    top = fresh.knn_search(
        spark.read.parquet(table), [9.0, 9.0, 9.0, 9.0], 1, ef_search=200
    ).first()
    assert top["rid"] == 100


def test_watermark_partition_mismatch_raises(spark, tmp_path, monkeypatch):
    """A pre-existing file stamped NEWER than the journal watermark
    breaks the newer-than-watermark derivation — the count check must
    fail loudly (rebuild guidance), never replay a wrong batch."""
    import os

    monkeypatch.setattr(sinks, "_JOURNAL_LIST_CAP", 0)
    table, ix = _mk(spark, tmp_path)
    proxy = _CrashingProxy(ix, "add_batch")
    sinks.bind_index(table, proxy)
    batch = spark.createDataFrame(
        [(100, [9.0, 9.0, 9.0, 9.0])], "rid long, vec array<float>"
    )
    try:
        with pytest.raises(_Crash):
            sinks.insert_into(batch, table)
    finally:
        sinks.unbind_indexes(table)
    # simulate the clock pathology: bump every table file far past the
    # watermark so the journaled count no longer partitions the listing
    future = (int(__import__("time").time()) + 3600) * 1_000_000_000
    for f in sinks._parquet_files(table):
        os.utime(f, ns=(future, future))
    with pytest.raises(PendingDmlError, match="does not partition"):
        sinks.resolve_pending_dml(spark, ix.path)
