"""Structured Streaming operators (memory sink, synchronous drive)."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.streaming import (
    read_events_stream,
    session_window_stats,
    streaming_index_refresh,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _drive(stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_windowed_counts(spark):
    ev = read_events_stream(spark, SF)
    _drive(windowed_event_counts(ev, "1 hour"), "win_counts", mode="append")
    out = spark.sql("SELECT * FROM win_counts")
    # append mode emits only watermark-closed windows; all but the last
    # hour of the fixture closes
    rows = out.collect()
    assert len(rows) > 0
    assert {r["event_type"] for r in rows} <= {"click", "view", "purchase", "signup", "error"}
    total_batch = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n"] for r in rows) <= total_batch


def test_session_windows(spark):
    ev = read_events_stream(spark, SF)
    _drive(session_window_stats(ev, gap="30 minutes"), "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_streaming_dedup_state_across_batches(spark, tmp_path):
    """applyInPandasWithState first-occurrence dedup: a key emitted in
    batch 1 must NOT re-emit when it reappears in batch 2 (per-key state
    survives via the checkpoint), while a genuinely new key does emit."""
    from duckdb_vss_spark.streaming import streaming_dedup_first

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sink_dir = str(tmp_path / "out")
    import os

    os.makedirs(src)
    spark.createDataFrame(
        [("a", 5), ("a", 3), ("b", 7)], "fp string, doc_id long"
    ).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("fp string, doc_id long").parquet(src)
        q = (
            streaming_dedup_first(stream, "fp", "doc_id")
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet")
            .option("path", sink_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    got1 = {(r["fp"], r["keep_id"]) for r in spark.read.parquet(sink_dir).collect()}
    assert got1 == {("a", 3), ("b", 7)}
    # batch 2: 'a' reappears with a lower id (must stay dropped — the
    # stream already emitted it), 'c' is new
    spark.createDataFrame(
        [("a", 1), ("c", 9)], "fp string, doc_id long"
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    got2 = {(r["fp"], r["keep_id"]) for r in spark.read.parquet(sink_dir).collect()}
    assert got2 == {("a", 3), ("b", 7), ("c", 9)}


def test_streaming_index_refresh(spark, tmp_path):
    from duckdb_vss_spark.index import load_index

    emb_path = "/root/testdata/sf0.001/embeddings.parquet"
    emb_schema = "vec_id long, embedding array<float>, label int"
    stage = tmp_path / "stream_src"
    stage.mkdir()
    (stage / "embeddings.parquet").symlink_to(emb_path)
    stream = spark.readStream.schema(emb_schema).parquet(str(stage))
    idx_path = str(tmp_path / "stream_idx")
    q = streaming_index_refresh(
        stream,
        base_df_provider=lambda: spark.read.parquet(emb_path),
        index_path=idx_path,
        vec_col="embedding",
        id_col="vec_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    idx = load_index(spark, idx_path)
    assert idx.count == spark.read.parquet(emb_path).count()
