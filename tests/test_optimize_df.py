"""DataFrame-API route into the index rules (VERDICT r10 #3):
``planner.optimize(df)`` must index-route the DataFrame TopN form —
``spark.table(t).orderBy(dist_expr).limit(k)`` — with the same
EXPLAIN-parity marker as the hooked-SQL path, and return every
non-matching DataFrame unchanged (the differential discipline of
test_catalyst_differential.py, DataFrame edition).

Reference shape: hnsw_optimize_scan.cpp:29-141 (match), :255-258
(rule registration on every plan)."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.index import create_hnsw_index, drop_index
from duckdb_vss_spark.operators import knn_search
from duckdb_vss_spark.plans import VssPlanner


@pytest.fixture(scope="module")
def dfp(spark, grid, tmp_path_factory):
    grid.createOrReplaceTempView("df_items")
    grid.createOrReplaceTempView("df_other")
    path = str(tmp_path_factory.mktemp("dfopt") / "idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path, overwrite=True
    )
    p = VssPlanner(spark)
    p.register_index("df_items", "vec", idx)
    yield p
    drop_index(path)


def _brute_ids(grid, qv, k):
    return [r["id"] for r in knn_search(grid, "vec", qv, k).select("id").collect()]


def _dist(q):
    return F.expr(f"array_distance(vec, array({q}))")


def test_orderby_limit_routes_to_index(spark, grid, dfp):
    df = spark.table("df_items").orderBy(_dist("2.0, 2.0, 2.0")).limit(3)
    fast = dfp.optimize(df)
    assert dfp.last_plan == "HNSW_INDEX_SCAN"
    got = [r["id"] for r in fast.select("id").collect()]
    assert got == _brute_ids(grid, [2.0, 2.0, 2.0], 3)
    # output schema parity (select-star keeps the view's column order);
    # the grid is tie-degenerate, so rows compare by DISTANCE multiset
    assert fast.columns == df.columns
    def dists(frame):
        return sorted(
            round(r["dd"], 9)
            for r in frame.withColumn("dd", _dist("2.0, 2.0, 2.0")).collect()
        )
    assert dists(fast) == dists(df)


def test_projected_distance_column_routes(spark, grid, dfp):
    """withColumn(dist) -> orderBy(dist) -> limit: the alias-target
    resolution must see through the projection, and the aliased
    distance column must survive in the routed output."""
    df = (
        spark.table("df_items")
        .withColumn("d", _dist("1.0, 1.0, 1.0"))
        .orderBy("d")
        .limit(4)
        .select("id", "d")
    )
    fast = dfp.optimize(df)
    assert dfp.last_plan == "HNSW_INDEX_SCAN"
    rows = fast.collect()
    assert [r["id"] for r in rows] == _brute_ids(grid, [1.0, 1.0, 1.0], 4)
    assert all(r["d"] is not None for r in rows)


def test_filtered_match_pulls_filter_up(spark, grid, dfp):
    """Filter pull-up parity with the SQL hook: the routed filtered
    TopN may under-return, and what it returns is the filter-surviving
    subset of the index's unfiltered top-k."""
    df = (
        spark.table("df_items")
        .where(F.col("id") < 50)
        .orderBy(_dist("9.0, 9.0, 9.0"))
        .limit(5)
        .select("id")
    )
    fast = dfp.optimize(df)
    assert dfp.last_plan == "HNSW_INDEX_SCAN"
    got = [r["id"] for r in fast.collect()]
    unfiltered = set(_brute_ids(grid, [9.0, 9.0, 9.0], 5))
    assert all(i < 50 for i in got)
    assert set(got) <= unfiltered


def test_non_matching_frames_returned_unchanged(spark, grid, dfp):
    t = spark.table("df_items")
    d = _dist("2.0, 2.0, 2.0")
    non_matching = [
        # descending / multi-key / no limit / limit without sort
        t.orderBy(d.desc()).limit(3),
        t.orderBy(d, F.col("id")).limit(3),
        t.orderBy(d),
        t.limit(3),
        # unregistered table
        spark.table("df_other").orderBy(d).limit(3),
        # non-constant query vector (column-column distance)
        t.alias("a")
        .crossJoin(spark.table("df_other").alias("b"))
        .orderBy(F.expr("array_distance(a.vec, b.vec)"))
        .limit(3),
        # aggregate under the limit
        t.groupBy(F.size("vec").alias("sz"))
        .count()
        .orderBy("count")
        .limit(2),
        # unpushable predicate (disjunction)
        t.where((F.col("id") < 3) | (F.col("id") > 20)).orderBy(d).limit(3),
        # computed vector wearing the indexed column's name
        t.withColumn("vec", F.expr("transform(vec, x -> x + 1.0)"))
        .orderBy(d)
        .limit(3),
    ]
    for df in non_matching:
        out = dfp.optimize(df)
        assert out is df, f"optimize() rewrote a non-matching frame: {df}"
        assert dfp.last_plan == "SEQ_SCAN"
        out.collect()  # and it still executes


def test_optimize_never_raises_on_odd_frames(spark, dfp):
    """optimize() must be safe to call on ANY DataFrame."""
    frames = [
        spark.range(5),
        spark.createDataFrame([(1, "a")], "id long, s string"),
        spark.range(3).groupBy().count(),
    ]
    for df in frames:
        assert dfp.optimize(df) is df


def test_quantized_index_routes_via_dataframe_api(spark, grid, tmp_path):
    """r12: the public DataFrame-API route (planner.optimize) fires for
    quantized artifacts too — same _index_hits generalization as the
    SQL hook; routed result == direct index call at the default
    signature (r13: the planner rescores the over-fetched shortlist
    exactly against the routed table, so this holds with or without a
    manifest rescore source)."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import create_bq_index
    from duckdb_vss_spark.plans import VssPlanner

    src = str(tmp_path / "grid_pq")
    grid.write.parquet(src)
    gridf = spark.read.parquet(src)
    gridf.createOrReplaceTempView("df_items_q")
    bq = create_bq_index(
        spark, gridf, "vec", "id", str(tmp_path / "bq"), overwrite=True
    )
    assert bq.manifest["source_files"]
    p = VssPlanner(spark)
    p.register_index("df_items_q", "vec", bq)
    df = (
        spark.table("df_items_q")
        .orderBy(F.expr("array_distance(vec, array(2.0, 2.0, 2.0))"))
        .limit(4)
        .select("id")
    )
    fast = p.optimize(df)
    assert p.last_plan == "BQ_INDEX_SCAN"
    direct = [r["id"] for r in bq.knn_search([2.0, 2.0, 2.0], 4).collect()]
    assert [r["id"] for r in fast.collect()] == direct


def test_sourceless_bq_routes_with_planner_rescore(spark, grid, tmp_path):
    """r13 (VERDICT r12 #2): a BQ artifact with NO resolvable rescore
    source is still routable — the planner over-fetches the Hamming
    shortlist as ids only and recomputes the EXACT metric on the
    broadcast id-join against the routed table itself (the routed
    table IS the source the query's distance call reads). ADC/Hamming
    approximate orderings are unreachable via SQL."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.index import create_bq_index
    from duckdb_vss_spark.plans import VssPlanner

    grid.createOrReplaceTempView("df_items_nq")
    # in-memory source: no files -> no fingerprintable rescore source
    bq = create_bq_index(
        spark, grid, "vec", "id", str(tmp_path / "bq_mem"), overwrite=True
    )
    assert bq.manifest["source_files"] == []
    p = VssPlanner(spark)
    p.register_index("df_items_nq", "vec", bq)
    stmt = (
        "SELECT id FROM df_items_nq "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 4"
    )
    # exact top-4 with the planner's deterministic (dist, id) tie-break
    want = [
        r["id"]
        for r in spark.sql(
            "SELECT id FROM df_items_nq "
            "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)), id LIMIT 4"
        ).collect()
    ]
    got = [r["id"] for r in p.sql(stmt).collect()]
    assert p.last_plan == "BQ_INDEX_SCAN"
    # tiny corpus: the calibrated shortlist covers it -> exact top-k
    assert got == want
    df = (
        spark.table("df_items_nq")
        .orderBy(F.expr("array_distance(vec, array(2.0, 2.0, 2.0))"))
        .limit(4)
        .select("id")
    )
    fast = p.optimize(df)
    assert p.last_plan == "BQ_INDEX_SCAN"
    assert [r["id"] for r in fast.collect()] == want


def test_genuinely_unroutable_index_falls_back_to_seq_scan(spark, grid, tmp_path):
    """An index whose manifest id column is absent from the routed
    table cannot late-materialize — the planner must raise the
    dedicated UnroutableIndexError internally and execute the
    statement unchanged (ADVICE r12: a broad LookupError catch would
    also swallow genuine routing bugs)."""
    from duckdb_vss_spark.index import create_bq_index
    from duckdb_vss_spark.plans import VssPlanner

    # the view renames the id column away from the manifest's id_col
    grid.withColumnRenamed("id", "key").createOrReplaceTempView("df_items_noid")
    bq = create_bq_index(
        spark, grid, "vec", "id", str(tmp_path / "bq_noid"), overwrite=True
    )
    p = VssPlanner(spark)
    p.register_index("df_items_noid", "vec", bq)
    stmt = (
        "SELECT key FROM df_items_noid "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 4"
    )
    got = p.sql(stmt)
    assert p.last_plan == "SEQ_SCAN"
    # tie-safe check: same distance multiset as the raw statement
    def dists(df):
        return sorted(
            r["d"]
            for r in df.join(spark.table("df_items_noid"), "key")
            .selectExpr("array_distance(vec, array(2.0, 2.0, 2.0)) AS d")
            .collect()
        )

    assert dists(got) == dists(spark.sql(stmt))
