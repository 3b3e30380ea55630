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


def _batch_events_us(spark):
    """Batch events with epoch-microsecond event time, computed
    independently of the streaming reader (footer-derived load_table +
    integer us arithmetic) — the reference computation both streaming
    aggregates must reproduce row-for-row. A unit error anywhere in the
    stream path (e.g. round 4's silent 1000× time collapse) shows up as
    a value diff here, not a weak `len > 0`."""
    from duckdb_vss_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )


def _rows_set(df):
    return {tuple(r) for r in df.collect()}


def test_windowed_counts_match_batch(spark):
    """Complete-mode streaming tumbling windows == batch integer-bucket
    aggregation, exact values (decimal sums on both sides)."""
    ev = read_events_stream(spark, SF)
    _drive(
        windowed_event_counts(ev, "1 hour", exact_sum=True),
        "win_counts",
        mode="complete",
    )
    got = _rows_set(
        spark.sql("SELECT * FROM win_counts").select(
            F.unix_micros(F.col("window.start")).alias("w_us"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "sum_value",
        )
    )
    hour_us = 3_600_000_000
    want = _rows_set(
        _batch_events_us(spark)
        .groupBy(
            (F.col("us") - F.col("us") % hour_us).alias("w_us"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        )
    )
    assert got == want


def test_session_windows_match_batch(spark):
    """Complete-mode streaming session windows == batch lag/flag-sum
    sessionization (30-min gap; window end = last event + gap)."""
    from pyspark.sql import Window

    ev = read_events_stream(spark, SF)
    _drive(
        session_window_stats(ev, gap="30 minutes", exact_sum=True),
        "sessions",
        mode="complete",
    )
    got = _rows_set(
        spark.sql("SELECT * FROM sessions").select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias("s_us"),
            F.unix_micros(F.col("session_window.end")).alias("e_us"),
            F.col("n_events").cast("long").alias("n_events"),
            "sum_value",
        )
    )
    gap_us = 1_800_000_000
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    base = _batch_events_us(spark)
    flagged = base.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    want = _rows_set(
        flagged.groupBy("user_id", "sid").agg(
            F.min("us").alias("s_us"),
            (F.max("us") + gap_us).alias("e_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
        ).drop("sid")
    )
    assert got == want


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


def test_curation_filters_compose_with_streams(spark, tmp_path):
    """The curation surface (quality folds, PII scrub, stratified
    sampling) is pure Column expressions, so it must apply unchanged to
    a Structured Streaming source: run the same keep-filter + scrub on
    a file stream (availableNow) and on the batch frame, and compare
    exactly. This is the streaming ingest shape of a curation pipeline:
    filter-and-scrub at the edge, no state, no watermark needed."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.pipeline.quality import repetition_keep
    from duckdb_vss_spark.pipeline.sample import hash_sample
    from duckdb_vss_spark.pipeline.scrub import redact_pii

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
    )
    src = str(tmp_path / "src")
    docs.write.parquet(src)

    def curate(df):
        kept = hash_sample(
            df.where(repetition_keep("text")), "doc_id", 0.5, seed=3
        )
        return kept.select("doc_id", F.md5(redact_pii("text")).alias("fp"))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    (
        curate(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = {(r["doc_id"], r["fp"]) for r in spark.read.parquet(out).collect()}
    want = {(r["doc_id"], r["fp"]) for r in curate(docs).collect()}
    assert got == want and len(want) > 0


def test_stream_interval_join_matches_batch(spark):
    """The watermarked stream-stream time-range join must produce the
    identical pair multiset as the batch inequality join over the same
    events (state GC must never drop an in-window pair under
    availableNow processing)."""
    import uuid

    from pyspark.sql import functions as F

    from duckdb_vss_spark.operators.interval import interval_join
    from duckdb_vss_spark.streaming import read_events_stream, stream_interval_join

    sf = "/root/testdata/sf0.001"
    clicks_s = read_events_stream(spark, sf).where(F.col("event_type") == "click")
    errors_s = read_events_stream(spark, sf).where(F.col("event_type") == "error")
    sink = f"t_ij_{uuid.uuid4().hex[:8]}"
    q = (
        stream_interval_join(clicks_s, errors_s, lookback="120 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r.click_id, r.err_id) for r in spark.table(sink).collect()
    )

    from duckdb_vss_spark.sources import load_table

    ev = load_table(spark, sf, "events")
    c = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", "ts"
    )
    batch = interval_join(
        c, e, on="ts", by="user_id", lower=-7_200_000_000, upper=0,
        right_cols=["err_id"],
    )
    want = sorted((r.event_id, r.err_id) for r in batch.collect())
    assert got == want


def test_stream_static_join_matches_batch_and_is_stateless(spark):
    """The stream-static enrichment must (a) value-match the batch
    join+window aggregate and (b) plan the dim side as a broadcast
    probed per micro-batch — only ONE stateful operator (the window
    agg), never stream-stream join state."""
    from duckdb_vss_spark.sources import load_table
    from duckdb_vss_spark.streaming import stream_static_enrich

    dim = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    agg = stream_static_enrich(
        read_events_stream(spark, SF), dim, "user_id", "c_custkey", window="15 minutes"
    )
    _drive(agg, "t_ss_join", mode="complete")
    got = {
        (r["window"].start, r["c_mktsegment"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.table("t_ss_join").collect()
    }

    ev = load_table(spark, SF, "events")
    exp = {
        (r["w"].start, r["c_mktsegment"]): (r["n"], round(r["sum_value"], 6))
        for r in (
            ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
            .groupBy(F.window("ts", "15 minutes").alias("w"), "c_mktsegment")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == exp and len(got) > 0
    # stateless join: exactly one stateful operator in the streaming plan
    prog = None
    for q in spark.streams.active:
        q.stop()
    # re-drive once to capture lastProgress with state info
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("t_ss_join2")
        .start()
    )
    q.processAllAvailable()
    prog = q.lastProgress
    q.stop()
    assert prog is not None and len(prog["stateOperators"]) == 1


def test_stream_knn_serve_is_zero_state(spark, tmp_path):
    """Online ANN serving must run as a ZERO-state append stream: no
    stateful operators at all (mapInPandas serve + stream-static
    payload join), and results must equal the batch knn_transform."""
    from duckdb_vss_spark.index import create_hnsw_index, drop_index
    from duckdb_vss_spark.sources import load_table
    from duckdb_vss_spark.streaming import read_embeddings_stream

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "serve_idx")
    idx = create_hnsw_index(
        spark, emb, vec_col="embedding", id_col="vec_id", path=path, overwrite=True
    )
    try:
        items = emb.where(F.col("embedding").isNotNull()).select("vec_id", "embedding")
        qs = (
            read_embeddings_stream(spark, SF)
            .where((F.col("vec_id") % 10 == 0) & F.col("embedding").isNotNull())
            .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        )
        served = idx.knn_transform(qs, items, "qvec", 3, "qid", ef_search=400)
        q = (
            served.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_knn_serve")
            .start()
        )
        q.processAllAvailable()
        prog = q.lastProgress
        q.stop()
        assert prog is not None and len(prog["stateOperators"]) == 0
        got = sorted(
            (r["qid"], r["vec_id"], r["rn"]) for r in spark.table("t_knn_serve").collect()
        )
        qb = (
            emb.where((F.col("vec_id") % 10 == 0) & F.col("embedding").isNotNull())
            .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        )
        exp = sorted(
            (r["qid"], r["vec_id"], r["rn"])
            for r in idx.knn_transform(qb, items, "qvec", 3, "qid", ef_search=400).collect()
        )
        assert got == exp and len(got) > 0
    finally:
        drop_index(path)


def test_streaming_matview_incremental_across_restarts(spark, tmp_path):
    """The materialized view must stay correct as new data arrives in
    later micro-batches/restarts: groups touched by batch 2 are
    upserted (not duplicated), untouched groups survive, and the final
    table equals the batch aggregate over ALL data."""
    from duckdb_vss_spark.sources import load_table
    from duckdb_vss_spark.streaming import streaming_matview, windowed_event_counts

    src = tmp_path / "src"
    tgt = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF, "events").orderBy("event_id").cache()
    half = ev.count() // 2
    first = ev.limit(half)
    first.write.parquet(str(src / "f1.parquet"))

    def run_once():
        stream = (
            spark.readStream.schema(first.schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        agg = windowed_event_counts(stream, window="15 minutes", exact_sum=True).select(
            F.unix_micros(F.col("window.start")).alias("ws"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "sum_value",
        )
        q = streaming_matview(agg, tgt, ["ws", "event_type"], ckpt)
        q.awaitTermination(120)

    run_once()
    n_half = spark.read.parquet(tgt).count()
    assert n_half > 0
    # second wave of data, new files in the same source dir
    ev.subtract(first).write.mode("append").parquet(str(src / "f2.parquet"))
    run_once()
    got = {
        (r["ws"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.read.parquet(tgt).collect()
    }
    exp = {
        (r["ws"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in (
            ev.groupBy(
                F.unix_micros(
                    F.timestamp_micros(
                        (F.unix_micros(F.col("ts").cast("timestamp")) / 900_000_000)
                        .cast("long")
                        * 900_000_000
                    )
                ).alias("ws"),
                "event_type",
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
            )
            .collect()
        )
    }
    assert got == exp


def test_streaming_dedup_against_store_matches_batch(spark, tmp_path):
    """The streamed incremental dedup must equal the one-shot batch
    minhash_match_store over the same new/ref split regardless of how
    the new side is chopped into micro-batches (3 files here), and a
    second run on the same checkpoint must be a no-op (no duplicate
    appends)."""
    from duckdb_vss_spark.pipeline.dedup import (
        _materialize,
        minhash_match_store,
        minhash_store,
    )
    from duckdb_vss_spark.sources import load_table
    from duckdb_vss_spark.streaming import streaming_dedup_against_store

    docs = load_table(spark, SF, "documents")
    store = _materialize(minhash_store(docs, "text", "doc_id"))
    new = store.where(F.col("id") % 3 == 0)
    ref = store.where(F.col("id") % 3 != 0)
    exp = {
        (r["new_id"], r["ref_id"])
        for r in minhash_match_store(new, ref, threshold=0.1).collect()
    }

    stage = str(tmp_path / "stage")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    docs.where(F.col("doc_id") % 3 == 0).repartition(3).write.parquet(stage)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = streaming_dedup_against_store(stream, ref, sink, ckpt, threshold=0.1)
    q.awaitTermination(120)
    got = {(r["new_id"], r["ref_id"]) for r in spark.read.parquet(sink).collect()}
    assert got == exp

    # restart on the same checkpoint: nothing new to process, no dupes
    stream2 = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q2 = streaming_dedup_against_store(stream2, ref, sink, ckpt, threshold=0.1)
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == len(got)


def test_streaming_index_add_incremental_and_restart(spark, tmp_path):
    """r12: streaming_index_add merges each micro-batch into the
    artifact via add_batch — O(batch) per epoch, not a rebuild. The
    epoch stamp rides the same atomic manifest write, so restarting
    from the checkpoint never double-merges, and a search over the
    final artifact matches brute force at ef>>k."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import load_index
    from duckdb_vss_spark.operators.topk import knn_search
    from duckdb_vss_spark.streaming.ops import streaming_index_add

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    h1 = emb.where(F.col("vec_id") % 2 == 0)
    h2 = emb.where(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "src")
    h1.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(src)
    idx_path = str(tmp_path / "inc_idx")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = streaming_index_add(
            spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
            index_path=idx_path,
            vec_col="embedding",
            id_col="vec_id",
            checkpoint_dir=ckpt,
        )
        q.processAllAvailable()
        q.stop()

    run_once()  # epoch 0: creates the artifact from the first half
    n1 = load_index(spark, idx_path).count
    assert n1 == h1.count()
    h2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # epoch 1 (restarted query, same checkpoint): add_batch
    idx = load_index(spark, idx_path)
    assert idx.count == emb.count()
    # the stamp is scoped to THIS stream's checkpoint (ADVICE r12)
    stamps = idx.manifest["last_epochs"]
    assert len(stamps) == 1 and max(stamps.values()) >= 1
    # a third run with NO new data must not re-merge anything
    run_once()
    assert load_index(spark, idx_path).count == emb.count()
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    got = {r["vec_id"] for r in idx.knn_search(emb, qv, 5, ef_search=400).collect()}
    want = {r["vec_id"] for r in knn_search(emb, "embedding", qv, 5).collect()}
    assert got == want

    # ADVICE r12 (the actual data-loss scenario): restarting with a
    # FRESH checkpoint resets epoch ids to 0 — the scoped stamp must
    # NOT suppress the new stream's early epochs
    extra = spark.createDataFrame(
        [(100_000 + i, [float(i)] * 64) for i in range(5)],
        "vec_id long, embedding array<float>",
    )
    extra.coalesce(1).write.mode("append").parquet(src)
    q = streaming_index_add(
        spark.readStream.schema("vec_id long, embedding array<float>").parquet(src),
        index_path=idx_path,
        vec_col="embedding",
        id_col="vec_id",
        checkpoint_dir=str(tmp_path / "ckpt_fresh"),
    )
    q.processAllAvailable()
    q.stop()
    # fresh checkpoint = the whole source replays; the old rows append
    # as duplicates (documented Insert semantics) but NOTHING is
    # dropped: the 5 genuinely-new ids must be searchable
    final = load_index(spark, idx_path)
    assert final.count == 2 * emb.count() + 5
    assert len(final.manifest["last_epochs"]) == 2


def test_streaming_index_add_replayed_epoch_skipped(spark, tmp_path):
    """The idempotency guard itself: merging the same epoch id twice is
    a no-op (simulates foreachBatch replay after a crash)."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import create_hnsw_index, load_index

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    idx_path = str(tmp_path / "rep_idx")
    ix = create_hnsw_index(
        spark, emb.where(F.col("vec_id") < 100), "embedding", "vec_id", idx_path
    )
    batch = emb.where(F.col("vec_id") >= 100)
    ix.add_batch(batch, manifest_extra={"last_epochs": {"ck1": 5}})
    n = ix.count
    # replay of epoch 5 on the SAME stream — the guard consults the
    # scoped stamp (ADVICE r12)
    re = load_index(spark, idx_path)
    assert int(re.manifest["last_epochs"]["ck1"]) == 5
    if int(re.manifest["last_epochs"].get("ck1", -1)) >= 5:
        pass  # guard fires: no second merge
    else:  # pragma: no cover
        re.add_batch(batch)
    assert load_index(spark, idx_path).count == n
    # a DIFFERENT stream's epoch 5 is not a replay — it must merge
    assert int(re.manifest["last_epochs"].get("ck2", -1)) < 5


def test_streaming_index_add_quantized_kind(spark, tmp_path):
    """r13: streaming_index_add generalized family-wide — index_kind
    picks any family with an add_batch. PQ face: epoch 0 creates (and
    freezes the codebooks), epoch 1 extends O(batch), the replay stamp
    rides the same atomic manifest commit, the file-count trigger
    compacts via the family's self-contained compact() WITHOUT losing
    the stamps, and a full-width-rerank search over the final artifact
    matches brute force over everything ingested."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index.pq import load_pq_index
    from duckdb_vss_spark.operators.topk import knn_search
    from duckdb_vss_spark.streaming.ops import streaming_index_add

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    h1 = emb.where(F.col("vec_id") % 2 == 0)
    h2 = emb.where(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "srcq")
    h1.coalesce(1).write.parquet(src)
    idx_path = str(tmp_path / "inc_pq")
    ckpt = str(tmp_path / "ckptq")

    def run_once():
        q = streaming_index_add(
            spark.readStream.schema(
                "vec_id long, embedding array<float>"
            ).parquet(src),
            index_path=idx_path,
            vec_col="embedding",
            id_col="vec_id",
            checkpoint_dir=ckpt,
            index_kind="pq",
            auto_compact_shards=1,  # force the quantized compact cadence
        )
        q.processAllAvailable()
        q.stop()

    run_once()  # epoch 0 creates the PQ artifact
    ix = load_pq_index(spark, idx_path)
    assert ix.count == h1.count()
    books0 = ix.manifest["codebooks"]
    h2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # epoch 1: add_batch with frozen codebooks + compact
    ix = load_pq_index(spark, idx_path)
    assert ix.count == emb.count()
    assert ix.manifest["codebooks"] == books0  # frozen, not retrained
    stamps = ix.manifest["last_epochs"]
    assert len(stamps) == 1 and max(stamps.values()) >= 1  # survived compact
    # the trigger repacked the appended part files into the right size
    import os as _os

    n_files = sum(
        1
        for _r, _d, names in _os.walk(_os.path.join(idx_path, "codes"))
        for nm in names
        if nm.endswith(".parquet")
    )
    assert n_files == 1
    # replay with no new data: stamp suppresses a re-merge
    run_once()
    assert load_pq_index(spark, idx_path).count == emb.count()
    # exactness: full-width rerank vs brute force over everything
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    got = {
        r["vec_id"]
        for r in ix.knn_search(qv, 5, rerank=ix.count, source=emb).collect()
    }
    want = {r["vec_id"] for r in knn_search(emb, "embedding", qv, 5).collect()}
    assert got == want


def test_streaming_index_delete(spark, tmp_path):
    """r13: streaming_index_delete — the streaming face of the Delete
    hook (reference hnsw_index.cpp:466-482). Ids arriving per
    micro-batch are tombstoned with the replay stamp riding the same
    atomic manifest commit; searches exclude them immediately; a
    pre-artifact batch is a DELETE-of-missing no-op; the dead-fraction
    trigger compacts (HNSW repack from own vectors) with the stamps
    preserved."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import create_hnsw_index, load_index
    from duckdb_vss_spark.operators.topk import knn_search
    from duckdb_vss_spark.streaming.ops import streaming_index_delete

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    del_src = str(tmp_path / "del_src")
    idx_path = str(tmp_path / "del_idx")
    ckpt = str(tmp_path / "del_ckpt")

    def run_once(**kw):
        q = streaming_index_delete(
            spark.readStream.schema("vec_id long").parquet(del_src),
            index_path=idx_path,
            checkpoint_dir=ckpt,
            **kw,
        )
        q.processAllAvailable()
        q.stop()

    # batch 0 arrives BEFORE the artifact exists: skipped, checkpoint
    # advances (delete-of-missing), and those ids stay live forever
    emb.where(F.col("vec_id") == 1).select("vec_id").coalesce(1).write.parquet(del_src)
    run_once()
    ix = create_hnsw_index(
        spark, emb, "embedding", "vec_id", idx_path, overwrite=True
    )
    n = ix.count
    # epoch 1: delete vec_id % 5 == 0
    dead1 = emb.where(F.col("vec_id") % 5 == 0).select("vec_id")
    dead1.coalesce(1).write.mode("append").parquet(del_src)
    run_once()
    ix = load_index(spark, idx_path)
    assert ix.count == n - dead1.count()
    assert ix.manifest["last_del_epochs"]  # stamped
    # replay (same checkpoint, no new data): nothing re-applied
    run_once()
    assert load_index(spark, idx_path).count == n - dead1.count()
    # search excludes the stream-deleted ids, exactly
    live = emb.where((F.col("vec_id") % 5 != 0))
    qv = [float(x) for x in emb.where(F.col("vec_id") == 3).first()["embedding"]]
    got = {
        r["vec_id"]
        for r in load_index(spark, idx_path)
        .knn_search(emb, qv, 10, ef_search=400)
        .collect()
    }
    want = {r["vec_id"] for r in knn_search(live, "embedding", qv, 10).collect()}
    assert got == want
    # epoch 2 pushes the dead fraction past the trigger -> compaction
    # physically reclaims (no tombstones left) and stamps survive
    dead2 = emb.where(F.col("vec_id") % 5 == 1).select("vec_id")
    dead2.coalesce(1).write.mode("append").parquet(del_src)
    run_once(auto_compact_dead_fraction=0.2)
    ix = load_index(spark, idx_path)
    assert ix.count == n - dead1.count() - dead2.count()
    assert not int(ix.manifest.get("deleted_count", 0))
    assert ix.manifest["last_del_epochs"]


def test_streaming_index_delete_quantized(spark, tmp_path):
    """The quantized face of the streaming delete: PQ artifact, ids
    tombstoned per epoch, dead-fraction trigger calls the family's
    self-contained compact(), full-width-rerank search stays exact."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index.pq import create_pq_index, load_pq_index
    from duckdb_vss_spark.operators.topk import knn_search
    from duckdb_vss_spark.streaming.ops import streaming_index_delete

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    idx_path = str(tmp_path / "pqd_idx")
    ix = create_pq_index(spark, emb, "embedding", "vec_id", idx_path)
    n = ix.count
    del_src = str(tmp_path / "pqd_src")
    dead = emb.where(F.col("vec_id") % 3 == 0).select("vec_id")
    dead.coalesce(1).write.parquet(del_src)
    q = streaming_index_delete(
        spark.readStream.schema("vec_id long").parquet(del_src),
        index_path=idx_path,
        checkpoint_dir=str(tmp_path / "pqd_ckpt"),
        index_kind="pq",
        auto_compact_dead_fraction=0.1,
    )
    q.processAllAvailable()
    q.stop()
    ix = load_pq_index(spark, idx_path)
    assert ix.count == n - dead.count()
    assert not int(ix.manifest.get("deleted_count", 0))  # compacted
    assert ix.manifest["last_del_epochs"]  # stamp survived compact()
    qv = [float(x) for x in emb.where(F.col("vec_id") == 7).first()["embedding"]]
    got = {
        r["vec_id"]
        for r in ix.knn_search(qv, 10, rerank=ix.count, source=emb).collect()
    }
    live = emb.where(F.col("vec_id") % 3 != 0)
    want = {r["vec_id"] for r in knn_search(live, "embedding", qv, 10).collect()}
    assert got == want


def test_streaming_add_quantized_no_autocompact(spark, tmp_path):
    """Review r15: auto_compact_shards=None (manual cadence) must not
    crash the quantized path's trigger arithmetic on the second
    batch."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index.pq import load_pq_index
    from duckdb_vss_spark.streaming.ops import streaming_index_add

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    h1 = emb.where(F.col("vec_id") % 2 == 0)
    h2 = emb.where(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "srcn")
    h1.coalesce(1).write.parquet(src)
    idx_path = str(tmp_path / "nc_pq")
    ckpt = str(tmp_path / "ckptn")

    def run_once():
        q = streaming_index_add(
            spark.readStream.schema(
                "vec_id long, embedding array<float>"
            ).parquet(src),
            index_path=idx_path,
            vec_col="embedding",
            id_col="vec_id",
            checkpoint_dir=ckpt,
            index_kind="pq",
            auto_compact_shards=None,
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    h2.coalesce(1).write.mode("append").parquet(src)
    run_once()  # pre-fix: TypeError(int(None)) killed this batch
    assert load_pq_index(spark, idx_path).count == emb.count()


def test_streaming_add_bare_stamp_fresh_checkpoint(spark, tmp_path):
    """Review r15: a pre-r13 bare last_epoch stamp is adopted only when
    this stream's epoch counter is already past it — a FRESH checkpoint
    restarts epochs at 0, and adopting a stamp of 500 would silently
    drop every batch."""
    import json
    import os

    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import load_index
    from duckdb_vss_spark.index.manifest import write_manifest
    from duckdb_vss_spark.streaming.ops import streaming_index_add

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
    )
    h1 = emb.where(F.col("vec_id") % 2 == 0)
    h2 = emb.where(F.col("vec_id") % 2 == 1)
    src = str(tmp_path / "srcb")
    h1.coalesce(1).write.parquet(src)
    idx_path = str(tmp_path / "bare_idx")

    q = streaming_index_add(
        spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(src),
        index_path=idx_path,
        vec_col="embedding",
        id_col="vec_id",
        checkpoint_dir=str(tmp_path / "ckpt_old"),
    )
    q.processAllAvailable()
    q.stop()
    # rewrite the manifest into the pre-r13 shape: bare stamp FAR
    # ahead of any fresh checkpoint's epoch counter
    man = json.load(open(os.path.join(idx_path, "manifest.json")))
    man.pop("last_epochs", None)
    man["last_epoch"] = 500
    write_manifest(idx_path, man)

    src2 = str(tmp_path / "srcb2")  # fresh SOURCE too — a fresh
    # checkpoint re-reads its source from scratch
    h2.coalesce(1).write.parquet(src2)
    q = streaming_index_add(
        spark.readStream.schema(
            "vec_id long, embedding array<float>"
        ).parquet(src2),
        index_path=idx_path,
        vec_col="embedding",
        id_col="vec_id",
        checkpoint_dir=str(tmp_path / "ckpt_new"),  # FRESH scope
    )
    q.processAllAvailable()
    q.stop()
    # pre-fix: the fresh-checkpoint batch (epoch 0 <= 500) was
    # silently dropped; the second half never reached the index
    assert load_index(spark, idx_path).count == emb.count()


def test_streaming_delete_resolves_pending_journal(spark, tmp_path):
    """Review r15: a delete-stream micro-batch landing inside a bound
    DML's pending_dml window REPLAYS the journal first (the catalog
    restart auto-heal) instead of dying on PendingDmlError — and then
    applies its own batch."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import create_hnsw_index, load_any_index
    from duckdb_vss_spark.index.manifest import set_pending
    from duckdb_vss_spark.streaming.ops import streaming_index_delete

    rows = [(i, [float(i), float(i % 5), 1.0, 0.0]) for i in range(24)]
    df = spark.createDataFrame(rows, "rid long, vec array<float>")
    table = str(tmp_path / "t")
    df.write.parquet(table)
    ix = create_hnsw_index(
        spark, df, vec_col="vec", id_col="rid",
        path=str(tmp_path / "ixp"), name="pendstream", metric="l2sq",
        overwrite=True,
    )
    # an insert journal whose files_before covers the whole table:
    # replay derives zero appended files and clears — the benign
    # "crash after clear was lost" shape
    files = sorted(
        str(p) for p in (tmp_path / "t").rglob("*.parquet")
    )
    ix.manifest = set_pending(
        ix.path,
        ix.manifest,
        {"op": "insert", "table": table, "files_before": files,
         "files_watermark": None, "token": "tok-r15"},
    )

    src = str(tmp_path / "del_src")
    spark.createDataFrame(
        [(i,) for i in range(4)], "rid long"
    ).coalesce(1).write.parquet(src)
    q = streaming_index_delete(
        spark.readStream.schema("rid long").parquet(src),
        index_path=ix.path,
        checkpoint_dir=str(tmp_path / "ckpt_del"),
    )
    q.processAllAvailable()
    q.stop()
    fresh = load_any_index(spark, ix.path)  # loads clean: journal gone
    assert "pending_dml" not in fresh.manifest
    assert int(fresh.manifest.get("deleted_count", 0)) == 4


def test_artifact_mutate_lock_serializes(tmp_path):
    """Review r15: the sibling-file advisory lock makes concurrent
    load→modify→commit cycles mutually exclusive — 2 threads × 25
    read-increment-write rounds lose no update."""
    import json
    import os
    import threading

    from duckdb_vss_spark.streaming.ops import _artifact_mutate_lock

    art = str(tmp_path / "art")
    os.makedirs(art)
    man = os.path.join(art, "counter.json")
    json.dump({"n": 0}, open(man, "w"))

    def bump():
        for _ in range(25):
            with _artifact_mutate_lock(art):
                d = json.load(open(man))
                d["n"] += 1
                json.dump(d, open(man, "w"))

    ts = [threading.Thread(target=bump) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert json.load(open(man))["n"] == 50
