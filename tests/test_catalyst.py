"""Catalyst-plan-level TopN→index rule + spark.sql hook
(plans/catalyst.py; reference: hnsw_optimize_scan.cpp:29-258, the
optimizer-extension registration at :255-258).

The bar from VERDICT r7 #10 / r8 #4 / r9: plain ``spark.sql("SELECT …
ORDER BY array_distance(vec, …) LIMIT k")`` — no VssPlanner call site —
must use the index, with EXPLAIN-visible evidence, and every
non-matching statement must execute untouched."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.index import create_hnsw_index, drop_index
from duckdb_vss_spark.operators import knn_search
from duckdb_vss_spark.plans import (
    VssPlanner,
    install_sql_extension,
    uninstall_sql_extension,
)


@pytest.fixture(scope="module")
def hooked(spark, grid, tmp_path_factory):
    grid.createOrReplaceTempView("grid_items")
    path = str(tmp_path_factory.mktemp("catidx") / "grid_idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path, overwrite=True
    )
    p = VssPlanner(spark)
    p.register_index("grid_items", "vec", idx)
    install_sql_extension(p)
    yield p
    uninstall_sql_extension(spark)
    drop_index(path)


def _brute_ids(grid, qv, k):
    return [r["id"] for r in knn_search(grid, "vec", qv, k).select("id").collect()]


def test_plain_sql_uses_index_with_explain_marker(spark, grid, hooked):
    df = spark.sql(
        "SELECT id, array_distance(vec, array(2.0, 2.0, 2.0)) AS d "
        "FROM grid_items ORDER BY d LIMIT 3"
    )
    # the reference asserts HNSW_INDEX_SCAN in EXPLAIN
    # (hnsw_basic.test:19-22); ours: planner marker + the index scan's
    # physical signature — either the executor-side mapInPandas graph
    # probe (large artifacts) or the r16 driver-probe candidate
    # In-filter (gate-small artifacts); a SEQ_SCAN fallback has neither
    assert hooked.last_plan == "HNSW_INDEX_SCAN"
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in phys or " IN (" in phys or "INSET " in phys
    assert [r["id"] for r in df.collect()] == _brute_ids(grid, [2.0, 2.0, 2.0], 3)


def test_order_by_unselected_expression(spark, grid, hooked):
    df = spark.sql(
        "SELECT id FROM grid_items "
        "ORDER BY array_distance(vec, array(1.0, 2.0, 3.0)) LIMIT 3"
    )
    assert hooked.last_plan == "HNSW_INDEX_SCAN"
    assert df.columns == ["id"]
    assert [r["id"] for r in df.collect()] == _brute_ids(grid, [1.0, 2.0, 3.0], 3)


def test_select_star_with_cast_literal(spark, grid, hooked):
    df = spark.sql(
        "SELECT * FROM grid_items ORDER BY "
        "array_distance(vec, cast(array(5.0, 5.0, 5.0) as array<float>)) LIMIT 2"
    )
    assert hooked.last_plan == "HNSW_INDEX_SCAN"
    assert sorted(df.columns) == sorted(grid.columns)
    assert df.count() == 2


def test_where_pulls_up_and_may_under_return(spark, grid, hooked):
    # filter pull-up semantics (hnsw_optimize_scan.cpp:161-191): k
    # nearest first, predicate after — may return fewer than k
    df = spark.sql(
        "SELECT id FROM grid_items WHERE id <= 2 "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    assert hooked.last_plan == "HNSW_INDEX_SCAN"
    top3 = _brute_ids(grid, [2.0, 2.0, 2.0], 3)
    assert [r["id"] for r in df.collect()] == [i for i in top3 if i <= 2]


def test_unpushable_where_blocks_rewrite(spark, grid, hooked):
    df = spark.sql(
        "SELECT id FROM grid_items WHERE id <= 2 OR id >= 20 "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    # OR blocks the pull-up (reference: residual filter blocks the
    # rewrite); result is exact filter-first semantics
    assert hooked.last_plan == "SEQ_SCAN"
    assert df.count() == 3


def test_descending_order_not_rewritten(spark, grid, hooked):
    df = spark.sql(
        "SELECT id FROM grid_items "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) DESC LIMIT 3"
    )
    assert hooked.last_plan == "SEQ_SCAN"
    assert df.count() == 3


def test_unregistered_table_falls_through(spark, grid, hooked):
    grid.createOrReplaceTempView("grid_other")
    df = spark.sql(
        "SELECT id FROM grid_other "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    assert hooked.last_plan == "SEQ_SCAN"
    assert df.count() == 3


def test_non_topn_sql_untouched(spark, grid, hooked):
    assert spark.sql("SELECT count(*) AS n FROM grid_items").first()["n"] == grid.count()
    assert hooked.last_plan == "SEQ_SCAN"
    # parameterized calls pass straight through the hook
    assert spark.sql("SELECT ? + 1 AS v", args=[1]).first()["v"] == 2


def test_subquery_wearing_table_name_not_matched(spark, grid, hooked):
    # a derived relation aliased to the registered name must NOT hit
    # the index (its rows could differ from the indexed table's)
    df = spark.sql(
        "SELECT id FROM (SELECT id, vec FROM grid_other WHERE id > 5) AS grid_items "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    assert hooked.last_plan == "SEQ_SCAN"
    assert all(r["id"] > 5 for r in df.collect())


def test_renamed_computed_vector_not_matched(spark, grid, hooked):
    # an expression aliased to the vec name must not be treated as the
    # indexed column (lineage check in _descend_to_relation)
    df = spark.sql(
        "SELECT id FROM (SELECT id, transform(vec, x -> x + 1.0) AS vec "
        "FROM grid_items) AS grid_items "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    assert hooked.last_plan == "SEQ_SCAN"
    assert df.count() == 3




def test_hook_preserves_spark_dialect(spark, grid, hooked):
    """Review r10: the hook must NEVER text-rewrite parseable Spark SQL
    — `<=>` is null-safe equality on a hooked session (not cosine
    distance), and operator glyphs inside string literals are data."""
    r = spark.sql("SELECT 1 <=> NULL AS a, NULL <=> NULL AS b").first()
    assert (r["a"], r["b"]) == (False, True)
    assert spark.sql("SELECT 'a <-> b' AS s").first()["s"] == "a <-> b"
    # reference dialect still reachable: it does NOT parse natively,
    # so the hook falls through to the DuckDB front-end
    df = spark.sql(
        "SELECT id FROM grid_items ORDER BY vec <-> [2.0,2.0,2.0]::FLOAT[3] LIMIT 3"
    )
    assert hooked.last_plan == "HNSW_INDEX_SCAN"
    assert df.count() == 3


def test_sort_by_per_partition_not_rewritten(spark, grid, hooked):
    # SORT BY is a per-partition sort (global=false) — rewriting it to
    # a global top-k would CHANGE results; must fall through
    df = spark.sql(
        "SELECT id FROM grid_items "
        "SORT BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    assert hooked.last_plan == "SEQ_SCAN"
    assert df.count() == 3


def test_cosine_subtract_form_matched_at_plan_level(spark, grid, hooked, tmp_path_factory):
    """1.0 - array_cosine_similarity(...) through plain spark.sql must
    fuse to the cosine-distance index route at PLAN level (the hook
    never text-rewrites valid SQL, so canonicalize_cosine can't help).
    Registers a cosine index on the module's hooked planner — install
    is idempotent, so a second planner could not take the hook."""
    path = str(tmp_path_factory.mktemp("catcos") / "idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path,
        metric="cosine", overwrite=True,
    )
    hooked.register_index("grid_items", "vec", idx)
    try:
        df = spark.sql(
            "SELECT id, 1.0 - array_cosine_similarity(vec, array(2.0, 2.0, 2.0)) AS d "
            "FROM grid_items ORDER BY d LIMIT 3"
        )
        assert hooked.last_plan == "HNSW_INDEX_SCAN"
        # the lattice is cosine-degenerate (every scalar multiple of the
        # query ties at distance 0), so compare the DISTANCE multiset —
        # any tie representative is a correct top-3
        want = sorted(
            round(r["dist"], 9)
            for r in knn_search(grid, "vec", [2.0, 2.0, 2.0], 3, metric="cosine").collect()
        )
        assert sorted(round(r["d"], 9) for r in df.collect()) == want
    finally:
        hooked._indexes[("grid_items", "vec")].remove(idx)
        drop_index(path)


def test_uninstall_restores_plain_sql(spark, grid, tmp_path_factory):
    grid.createOrReplaceTempView("grid_items")
    path = str(tmp_path_factory.mktemp("catidx2") / "idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path, overwrite=True
    )
    p = VssPlanner(spark)
    p.register_index("grid_items", "vec", idx)
    install_sql_extension(p)
    install_sql_extension(p)  # idempotent
    uninstall_sql_extension(spark)
    p.last_plan = ""
    df = spark.sql(
        "SELECT id FROM grid_items "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    assert p.last_plan == ""  # hook gone — planner never consulted
    assert df.count() == 3
    drop_index(path)


def test_hook_survives_independent_session_references(spark, grid, hooked):
    """Hook scope (VERDICT r10 #6): install_sql_extension patches the
    session OBJECT, and the common re-entry paths hand back that same
    object — ``SparkSession.builder.getOrCreate()``, an active-session
    lookup, and ``df.sparkSession`` — so the hooked behavior survives
    all of them. A reference constructed around a different Python
    wrapper of the same JVM session would bypass the hook; that
    limitation is documented in README (per-session-object scope)."""
    from pyspark.sql import SparkSession

    # a previous test in this module exercises uninstall; re-install
    # (idempotent) so this test sees the hooked session
    install_sql_extension(hooked)
    stmt = (
        "SELECT id FROM grid_items "
        "ORDER BY array_distance(vec, array(2.0, 2.0, 2.0)) LIMIT 3"
    )
    for label, sess in [
        ("getOrCreate", SparkSession.builder.getOrCreate()),
        ("getActiveSession", SparkSession.getActiveSession()),
        ("df.sparkSession", grid.sparkSession),
    ]:
        assert sess is spark, f"{label} returned a different session object"
        hooked.last_plan = ""
        got = [r["id"] for r in sess.sql(stmt).collect()]
        assert hooked.last_plan == "HNSW_INDEX_SCAN", f"hook missed via {label}"
        assert len(got) == 3
