"""Physical-plan audits for the headline operators.

Correct RESULTS are necessary but not sufficient at 100 TB — the PLAN
has to be the one you'd want on a 1000-executor cluster. These tests
pin the load-bearing plan properties so a regression (lost pushdown, a
sort where a top-k heap should be, a shuffled dim that should
broadcast) fails loudly at sf0.001 instead of surfacing as a 100×
slowdown in production:

- filters/IN-lists reach the parquet scan (PushedFilters);
- column pruning reaches the scan (ReadSchema carries only used cols);
- small dimension tables broadcast (BroadcastHashJoin, no shuffle);
- ORDER BY dist LIMIT k compiles to TakeOrderedAndProject (bounded
  heap per partition + driver merge of k·P rows — never a full sort);
- aggregates run partial→final (map-side combine halves the shuffle);
- relational pipelines run inside WholeStageCodegen spans;
- IVF probes compile to parquet partition pruning (tested in
  test_ivf.py::test_partition_pruning_in_plan).
"""

import contextlib
import io

from pyspark.sql import functions as F

from duckdb_vss_spark.operators import knn_search
from duckdb_vss_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_and_column_pushdown_reach_scan(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.where(F.col("l_shipdate") <= "1998-09-02").select("l_returnflag", "l_quantity")
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:200]
    # pruned read schema: only the 3 referenced columns, not all 16
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_returnflag" in read and "l_extendedprice" not in read


def test_small_dims_broadcast_in_join(spark):
    """q03 shape: customer⋈orders⋈lineitem with a selective dim side —
    the dim must broadcast, never shuffle the fact table for it."""
    import duckdb_vss_spark.queries as Q

    df = Q.q03_shipping_priority(spark, SF)
    plan = plan_of(df, "simple")
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered_not_global_sort(spark):
    emb = load_table(spark, SF, "embeddings")
    qv = [0.0] * len(emb.select("embedding").first()[0])
    df = knn_search(emb, "embedding", qv, 10)
    plan = plan_of(df, "simple")
    assert "TakeOrderedAndProject" in plan
    # a global Sort before the limit would be the scale-killer
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_aggregate_is_partial_then_final(spark):
    li = load_table(spark, SF, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    plan = plan_of(df, "simple")
    # partial + final HashAggregate pair = map-side combine before the
    # exchange; one single aggregate after a full shuffle would ship
    # every row
    assert plan.count("HashAggregate") >= 2
    pre_exchange = plan.split("Exchange")[-1]
    assert "HashAggregate" in pre_exchange


def test_relational_query_runs_in_codegen(spark):
    import duckdb_vss_spark.queries as Q

    # AQE hides codegen until execution: run the query, then read the
    # FINAL adaptive plan — the *(n) markers are the codegen stage ids
    df = Q.q01_pricing_summary(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("*(") >= 2  # scan→partial-agg and final-agg stages


def test_lateral_knn_join_has_no_cartesian_blowup_markers(spark):
    """The indexed/grouped knn join paths must not plan a cartesian
    product; only the documented brute-force oracle paths may."""
    from duckdb_vss_spark.index import create_hnsw_index
    import tempfile

    emb = load_table(spark, SF, "embeddings")
    with tempfile.TemporaryDirectory() as d:
        idx = create_hnsw_index(
            spark, emb, "embedding", "vec_id", f"{d}/idx", overwrite=True
        )
        q = emb.limit(5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        joined = idx.knn_join(q, emb.select("vec_id", "embedding"), "qvec", 3, "qid")
        plan = plan_of(joined, "simple")
        assert "CartesianProduct" not in plan


def test_hnsw_knn_join_is_single_stage_no_union(spark):
    """VERDICT r5 #1 done-criterion: the executor-side ANN lateral join
    plans ONE MapInPandas over the queries side — no per-chunk
    broadcast/union chain (the old driver-relay shape grew the plan by
    one Union + broadcast per 65k queries)."""
    from duckdb_vss_spark.index import create_hnsw_index
    import tempfile

    emb = load_table(spark, SF, "embeddings")
    with tempfile.TemporaryDirectory() as d:
        idx = create_hnsw_index(
            spark, emb, "embedding", "vec_id", f"{d}/idx", overwrite=True
        )
        q = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        joined = idx.knn_join(
            q, emb.select("vec_id", "embedding"), "qvec", 3, "qid",
            queries_per_batch=2,  # tiny chunks must NOT multiply plan nodes
        )
        plan = plan_of(joined, "simple")
        assert plan.count("MapInPandas") == 1, plan
        assert "Union" not in plan, plan


def test_repetition_stats_is_map_only(spark):
    """Per-doc quality statistics must never cost a corpus-wide
    exchange: the whole query is a Project over the scan (in-row folds,
    no explode, no shuffle)."""
    import duckdb_vss_spark.queries_pipeline as QP

    df = QP.q_repetition_stats(spark, SF)
    plan = plan_of(df, "simple")
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode of tokens


def test_pii_scrub_is_map_only(spark):
    import duckdb_vss_spark.queries_pipeline as QP

    df = QP.q_pii_scrub(spark, SF)
    plan = plan_of(df, "simple")
    assert "Exchange" not in plan


def test_vocab_topk_partial_agg_and_take_ordered(spark):
    """One partial->final aggregation shuffle keyed by token, then a
    bounded-heap top-k — never a global sort of the vocabulary."""
    import duckdb_vss_spark.queries_pipeline as QP

    df = QP.q_vocab_topk(spark, SF)
    plan = plan_of(df, "simple")
    assert "partial_count" in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1


def test_contamination_no_cartesian(spark):
    """The contamination scan must be an equi-join on the gram hash —
    a cartesian/nested-loop marker means the inverted index broke."""
    import duckdb_vss_spark.queries_pipeline as QP

    df = QP.q_contamination(spark, SF)
    plan = plan_of(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # eval ≪ train → the distinct eval gram keys broadcast and filter
    # the train side map-side BEFORE any exchange (VERDICT r8 #7): the
    # shuffle carries only colliding train grams, not the full gram set
    assert "BroadcastHashJoin" in plan


def test_pq_adc_scan_reads_only_codes(spark, tmp_path):
    """The ADC scan stage must read (id, pq_code) from the codes file —
    never original vectors — and merge via TakeOrderedAndProject."""
    from duckdb_vss_spark.index import create_pq_index

    emb = load_table(spark, SF, "embeddings")
    idx = create_pq_index(
        spark, emb, "embedding", "vec_id", str(tmp_path / "pq"),
        m=8, ksub=8, overwrite=True,
    )
    qv = [float(x) for x in emb.first()["embedding"]]
    # rerank=0 pins the ADC-only scan shape (the r11 DEFAULT auto-reranks,
    # which legitimately adds the source scan for exact distances).
    # Force the DISTRIBUTED path — gate-small artifacts default to the
    # r16 driver-resolved shortlist (test_quantized_driver_search pins
    # that route)
    spark.conf.set("spark.vss.driver_probe_max_bytes", "0")
    try:
        df = idx.knn_search(qv, 5, rerank=0)
    finally:
        spark.conf.unset("spark.vss.driver_probe_max_bytes")
    plan = plan_of(df)
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "pq_code" in read and "embedding" not in read
    assert "TakeOrderedAndProject" in plan


def test_kmv_sketch_single_group_shuffle(spark):
    """The KMV estimate's exchange must carry only the pre-pruned
    bottom-k rows: one shuffle (on the group key), no distinct/Expand
    over the raw key set."""
    from duckdb_vss_spark.pipeline.sketch import kmv_distinct
    from duckdb_vss_spark.pipeline.text import word_ngrams

    docs = load_table(spark, SF, "documents")
    grams = docs.select("lang", F.explode(word_ngrams("text", 2)).alias("gm"))
    df = kmv_distinct(grams, "gm", k=64, group_cols=["lang"])
    plan = plan_of(df, "simple")
    assert plan.count("Exchange") == 1
    assert "Expand" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_pq_and_ivfpq_joins_have_no_cartesian(spark, tmp_path):
    """The batched ADC joins are executor-side query streams (r10,
    VERDICT r9 #2): ONE mapInPandas stage over the queries DataFrame —
    no cartesian/NLJ, no driver collect, no exchange at all in the
    no-rerank path (ranks come off the stream's sorted heaps), and the
    codes are read via pyarrow inside the workers, never through a
    full Spark scan riding the plan. List-granular pruning of the
    IVFADC reads is pinned separately by
    test_ivfpq.test_knn_join_stream_prunes_unprobed_lists."""
    from duckdb_vss_spark.index import create_ivfpq_index, create_pq_index

    emb = load_table(spark, SF, "embeddings")
    # filter (not limit) query source: LIMIT itself plans an exchange,
    # which would mask the join's own zero-shuffle property
    qs = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    pq = create_pq_index(
        spark, emb, "embedding", "vec_id", str(tmp_path / "pq"),
        m=8, ksub=8, overwrite=True,
    )
    # rerank=0 pins the zero-shuffle ADC stream (the r11 DEFAULT
    # auto-reranks, which legitimately adds the rerank join stages)
    plan = plan_of(pq.knn_join(qs, "qv", 3, "qid", rerank=0), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # zero-shuffle: single stream stage

    ipq = create_ivfpq_index(
        spark, emb, "embedding", "vec_id", str(tmp_path / "ivfpq"),
        nlist=4, m=8, ksub=8, overwrite=True,
    )
    jplan = plan_of(ipq.knn_join(qs, "qv", 3, "qid", nprobe=2, rerank=0), "simple")
    assert "CartesianProduct" not in jplan
    assert "MapInPandas" in jplan
    assert "Exchange" not in jplan


def test_asof_join_single_exchange_no_nested_loop(spark):
    """The asof union-merge idiom shuffles ONCE (on the by key) and
    never plans a nested-loop/cartesian — the property that makes it
    viable where the naive inequality join is not."""
    from duckdb_vss_spark.operators.asof import asof_join

    ev = load_table(spark, SF, "events")
    clicks = ev.where(F.col("event_type") == "click")
    errors = ev.where(F.col("event_type") == "error")
    j = asof_join(clicks, errors, on="ts", by="user_id", right_cols=["event_id"])
    plan = plan_of(j, "simple")
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    # one hashpartitioning exchange on user_id for the window
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_is_equi_join(spark):
    from duckdb_vss_spark.operators.interval import interval_join

    ev = load_table(spark, SF, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "user_id", "ts"
    )
    j = interval_join(
        clicks, errors, on="ts", by="user_id", lower=-600_000_000, upper=0,
        right_cols=["err_id"],
    )
    plan = plan_of(j)
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Join" in plan  # an actual (hash) equi-join on (user_id, bucket)


def test_chunk_documents_zero_shuffle(spark):
    from duckdb_vss_spark.pipeline.chunk import chunk_documents

    docs = load_table(spark, SF, "documents")
    plan = plan_of(chunk_documents(docs, "text", "doc_id", 32, 8))
    assert "Exchange" not in plan  # map-only: explode + slice, no shuffle


def test_source_cap_uses_window_group_limit(spark):
    from duckdb_vss_spark.pipeline.sample import source_cap

    docs = load_table(spark, SF, "documents")
    plan = plan_of(source_cap(docs, "doc_id", "source", 10))
    # Spark 4 plans rank<=k as WindowGroupLimit with a PARTIAL mode
    # instance below the exchange: each task pre-prunes to cap rows per
    # group before shuffling (the skew guard at 100 TB).
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") >= 2  # partial + final


def test_rollup_single_exchange_expand(spark):
    from duckdb_vss_spark.queries import _QUERIES

    df = _QUERIES["q_rollup_revenue"](spark, SF)
    plan = plan_of(df, "simple")
    assert "Expand" in plan  # grouping sets expanded map-side
    # a single agg exchange (the final orderBy adds a range exchange,
    # not a second hash one)
    assert plan.count("Exchange hashpartitioning") == 1


def test_bm25_term_filter_below_explode_and_broadcasts(spark):
    from duckdb_vss_spark.pipeline.bm25 import bm25_scores

    docs = load_table(spark, SF, "documents")
    plan = plan_of(bm25_scores(docs, "text", "doc_id", ["join", "window"], topk=5))
    assert "BroadcastExchange" in plan  # df + corpus stats ride broadcasts
    assert "Cartesian" not in plan  # the 1-row stats cross join broadcasts too
    assert "TakeOrderedAndProject" in plan  # topk never global-sorts


def test_semdedup_assignment_is_shuffle_free_preagg(spark):
    from duckdb_vss_spark.pipeline.semdedup import assign_clusters, seeded_centroids

    emb = load_table(spark, SF, "embeddings")
    plan = plan_of(assign_clusters(emb, "embedding", "vec_id", seeded_centroids(4, 64)))
    assert "Exchange" not in plan and "pythonUDF" not in plan.lower()


def test_q02_decorrelates_scalar_min_to_single_window(spark):
    """TPC-H Q2 shape: the correlated `cost = (SELECT min(cost) ...)`
    must decorrelate to ONE window-min over the filtered join output —
    never a correlated re-execution or a second scan of the supply
    side — with every dimension broadcast."""
    import duckdb_vss_spark.queries as Q

    plan = plan_of(Q.q02_min_cost_supplier(spark, SF), "simple")
    assert plan.count("Window") == 1
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan and "NestedLoop" not in plan
    # supply agg runs partial->final (map-side combine before the shuffle)
    assert "partial_min" in plan


def test_q11_scalar_subquery_is_one_row_broadcast(spark):
    """TPC-H Q11 shape: the grand-total scalar subquery must come back
    as a 1-row broadcast nested-loop (the ONLY acceptable nested-loop:
    one row × N), not a cartesian or a re-aggregation per row."""
    import duckdb_vss_spark.queries as Q

    plan = plan_of(Q.q11_important_parts(spark, SF), "simple")
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan


def test_q20_nested_in_chain_is_stacked_broadcast_semis(spark):
    """TPC-H Q20 shape: the nested IN-subquery chain must plan as
    stacked broadcast LEFT SEMI joins (part→lineitem, movers→supplier,
    region→nation) — no distinct, no sort-merge, no shuffle of the
    supplier side."""
    import duckdb_vss_spark.queries as Q

    plan = plan_of(Q.q20_promotion_suppliers(spark, SF), "simple")
    assert plan.count("LeftSemi") >= 3
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_hash_embed_is_one_exchange_partial_agg(spark):
    """Feature hashing must be explode → map-side bucket math → ONE
    partial→final aggregation exchange — the exchange carries at most
    docs×dim rows regardless of token count. No joins of any kind."""
    import duckdb_vss_spark.queries_pipeline as QP

    plan = plan_of(QP.q_hash_embed(spark, SF), "simple")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan
    assert "Join" not in plan and "Cartesian" not in plan


def test_time_gapfill_joins_are_constant_sized(spark):
    """The gap-fill spine must be broadcast-shaped: the only
    nested-loop is the constant-sized spine construction (types ×
    hours, both derived from one-row/distinct aggregates) and the
    fill itself is a BroadcastHashJoin — data-sized rows shuffle only
    for the one bucketed group-by."""
    import duckdb_vss_spark.queries as Q

    plan = plan_of(Q.q_time_gapfill(spark, SF), "simple")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "partial_count" in plan or "partial_sum" in plan or "partial_min" in plan


def test_two_consumer_aggregates_scan_fact_table_once(spark):
    """r10 plan audit: q15/q11 feed a small grouped relation into two
    branches (own join + 1-row global agg) — without materialization
    the lineitem agg ran twice (AQE gives no exchange reuse across the
    broadcast boundary); q18's textbook form scanned lineitem twice by
    construction. All three must show at most ONE lineitem FileScan in
    the executed plan (zero when a checkpoint absorbed it)."""
    import duckdb_vss_spark.queries as Q

    pool = {**Q._QUERIES, **Q._EXTRA_QUERIES}
    for name in ("q15_top_supplier", "q11_important_parts", "q18_large_orders"):
        df = pool[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("lineitem.parquet") <= 1, (
            f"{name} scans lineitem {plan.count('lineitem.parquet')}x"
        )


def test_bq_index_scan_shape(spark, tmp_path):
    """r12 persisted BQ artifact: the Hamming shortlist scan reads ONLY
    (id, sig) from the signatures parquet — never the vectors — merges
    via TakeOrderedAndProject, and runs with no Python worker anywhere
    in the shortlist stage (the signature/Hamming math is pure Column
    codegen)."""
    from duckdb_vss_spark.index import create_bq_index

    emb = load_table(spark, SF, "embeddings")
    idx = create_bq_index(
        spark, emb.select("vec_id", "embedding"), "embedding", "vec_id",
        str(tmp_path / "bq"), overwrite=True,
    )
    qv = [float(x) for x in emb.where(F.col("embedding").isNotNull()).first()["embedding"]]
    # rescore=0 pins the shortlist-only shape (the default adds the
    # legitimate rescore join against the fingerprinted source).
    # Force the DISTRIBUTED path — gate-small artifacts default to the
    # r16 driver-resolved shortlist (test_quantized_driver_search pins
    # that route)
    spark.conf.set("spark.vss.driver_probe_max_bytes", "0")
    try:
        plan = plan_of(idx.knn_search(qv, 5, rescore=0))
    finally:
        spark.conf.unset("spark.vss.driver_probe_max_bytes")
    read = plan.split("ReadSchema")[1].splitlines()[0]
    assert "sig" in read and "embedding" not in read
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
