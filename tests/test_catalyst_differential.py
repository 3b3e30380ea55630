"""Differential safety net for the spark.sql hook (plans/catalyst.py).

For every statement the TopN rule must NOT fire on, the hooked session
must return byte-identical results to the raw session AND report
SEQ_SCAN — covering the trap shapes a plan matcher can false-fire on:
aggregates under limits, multi-key sorts, descending sorts, CTEs and
derived tables wearing the indexed table's name, joins, windows,
set ops, DISTINCT, correlated predicates."""

import pytest

from duckdb_vss_spark.index import create_hnsw_index, drop_index
from duckdb_vss_spark.plans import (
    VssPlanner,
    install_sql_extension,
    uninstall_sql_extension,
)


@pytest.fixture(scope="module")
def hooked2(spark, grid, tmp_path_factory):
    grid.createOrReplaceTempView("grid_items")
    grid.createOrReplaceTempView("grid_b")
    path = str(tmp_path_factory.mktemp("catdiff") / "idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path, overwrite=True
    )
    p = VssPlanner(spark)
    p.register_index("grid_items", "vec", idx)
    install_sql_extension(p)
    yield p
    uninstall_sql_extension(spark)
    drop_index(path)


# statements that must execute UNCHANGED (rule must not fire)
_NON_MATCHING = [
    # plain relational
    "SELECT count(*) AS n FROM grid_items",
    "SELECT id FROM grid_items WHERE id < 5 ORDER BY id LIMIT 3",
    "SELECT id FROM grid_items ORDER BY id DESC LIMIT 3",
    "SELECT DISTINCT size(vec) AS d FROM grid_items",
    # aggregate under a limit
    "SELECT size(vec) AS d, count(*) AS n FROM grid_items GROUP BY size(vec) "
    "ORDER BY n LIMIT 2",
    # multi-key sort over a distance expression — not the single-key shape
    "SELECT id FROM grid_items "
    "ORDER BY array_distance(vec, array(1.0,1.0,1.0)), id LIMIT 3",
    # descending distance
    "SELECT id FROM grid_items "
    "ORDER BY array_distance(vec, array(1.0,1.0,1.0)) DESC LIMIT 3",
    # ORDER BY without LIMIT / LIMIT without ORDER BY
    "SELECT id FROM grid_items ORDER BY array_distance(vec, array(1.0,1.0,1.0))",
    "SELECT count(*) AS n FROM (SELECT * FROM grid_items LIMIT 5)",
    # non-constant query vector (column-column distance)
    "SELECT a.id, b.id AS id2 FROM grid_items a JOIN grid_b b ON a.id < b.id "
    "ORDER BY array_distance(a.vec, b.vec) LIMIT 3",
    # CTE wearing the indexed name
    "WITH grid_items AS (SELECT id, vec FROM grid_b WHERE id > 3) "
    "SELECT id FROM grid_items "
    "ORDER BY array_distance(vec, array(1.0,1.0,1.0)) LIMIT 3",
    # derived table wearing the indexed name
    "SELECT id FROM (SELECT id, vec FROM grid_b WHERE id > 3) AS grid_items "
    "ORDER BY array_distance(vec, array(1.0,1.0,1.0)) LIMIT 3",
    # unpushable predicates
    "SELECT id FROM grid_items WHERE id < 3 OR id > 20 "
    "ORDER BY array_distance(vec, array(1.0,1.0,1.0)) LIMIT 3",
    "SELECT id FROM grid_items WHERE size(vec) = 3 AND id + 1 < 5 "
    "ORDER BY array_distance(vec, array(1.0,1.0,1.0)) LIMIT 3",
    # window functions
    "SELECT id, row_number() OVER (ORDER BY id) AS rn FROM grid_items "
    "ORDER BY rn LIMIT 4",
    # set operation
    "SELECT id FROM grid_items WHERE id < 3 UNION ALL "
    "SELECT id FROM grid_b WHERE id > 20 ORDER BY id LIMIT 5",
    # correlated EXISTS
    "SELECT id FROM grid_items g WHERE EXISTS "
    "(SELECT 1 FROM grid_b b WHERE b.id = g.id AND b.id < 4) ORDER BY id LIMIT 3",
    # null-safe equality operator must keep Spark semantics
    "SELECT (1 <=> NULL) AS a, (NULL <=> NULL) AS b",
    # distance in SELECT but sort on something else
    "SELECT id, array_distance(vec, array(1.0,1.0,1.0)) AS d FROM grid_items "
    "ORDER BY id LIMIT 3",
    # HAVING
    "SELECT size(vec) AS d, count(*) AS n FROM grid_items GROUP BY size(vec) "
    "HAVING count(*) > 1 ORDER BY d LIMIT 3",
]


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_non_matching_statements_execute_unchanged(spark, grid, hooked2):
    raw = spark._vss_sql_original
    for stmt in _NON_MATCHING:
        expected = _canon(raw(stmt).collect())
        hooked2.last_plan = ""
        got = _canon(spark.sql(stmt).collect())
        assert got == expected, f"hook changed results for: {stmt}"
        assert hooked2.last_plan in ("", "SEQ_SCAN"), (
            f"rule fired on non-matching statement: {stmt} "
            f"(last_plan={hooked2.last_plan})"
        )


def test_filtered_match_documents_filter_pullup_divergence(spark, grid, hooked2):
    """INTENTIONAL semantic divergence on MATCHING filtered statements
    (ADVICE r10, documented here by contract): the TopN rule applies
    WHERE above the k-row index scan — reference parity with the
    filter pull-up in hnsw_optimize_scan.cpp:161-191 — so a filtered
    `ORDER BY dist LIMIT k` through the hooked session may UNDER-return
    versus vanilla Spark (which filters first, then takes top-k of the
    survivors). The rows it does return must be the filter-surviving
    subset of the index's top-k, in vanilla order."""
    raw = spark._vss_sql_original
    stmt = (
        "SELECT id FROM grid_items WHERE id < 50 "
        "ORDER BY array_distance(vec, array(9.0, 9.0, 9.0)) LIMIT 5"
    )
    hooked2.last_plan = ""
    got = [r["id"] for r in spark.sql(stmt).collect()]
    assert hooked2.last_plan == "HNSW_INDEX_SCAN"
    vanilla = [r["id"] for r in raw(stmt).collect()]
    assert len(vanilla) == 5
    # the unfiltered top-5 around (9,9,9) all have id >= 50, so the
    # pulled-up filter under-returns — the divergence this test pins
    assert len(got) < len(vanilla)
    # and what IS returned is a prefix-consistent subset: every row
    # passes the filter and belongs to the index's unfiltered top-k
    unfiltered = [
        r["id"]
        for r in raw(
            "SELECT id FROM grid_items "
            "ORDER BY array_distance(vec, array(9.0, 9.0, 9.0)) LIMIT 5"
        ).collect()
    ]
    assert all(i < 50 for i in got)
    assert set(got) <= set(unfiltered)


def test_prefilter_overfetch_returns_k_survivors(spark, grid, hooked2):
    """VERDICT r11 #4: both filtered-ANN modes pinned side by side.
    Default (post-filter pull-up) keeps reference parity and may
    under-return; prefilter_overfetch=c opts into Spark-native WHERE
    semantics — over-fetch max(ceil(c·k), k+8) per shard, filter the
    pool, return the k nearest SURVIVORS — and on this fixture must
    equal vanilla Spark's filter-first top-k exactly."""
    idx = hooked2._indexes[("grid_items", "vec")][0]
    qv = [9.0, 9.0, 9.0]
    # reference-parity default: under-returns (the unfiltered top-5
    # around (9,9,9) all have id >= 50)
    pulled = idx.knn_search(grid, qv, 5, post_filter="id < 50").collect()
    assert len(pulled) < 5
    # Spark-native mode: k survivors, identical to vanilla filter-first
    native = [
        r["id"]
        for r in idx.knn_search(
            grid, qv, 5, ef_search=400, post_filter="id < 50",
            prefilter_overfetch=200.0,
        ).collect()
    ]
    raw = spark._vss_sql_original
    vanilla = [
        r["id"]
        for r in raw(
            "SELECT id FROM grid_items WHERE id < 50 "
            "ORDER BY array_distance(vec, array(9.0, 9.0, 9.0)), id LIMIT 5"
        ).collect()
    ]
    assert len(native) == 5 and native == vanilla


def test_prefilter_overfetch_validation(spark, grid, hooked2):
    idx = hooked2._indexes[("grid_items", "vec")][0]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="requires post_filter"):
        idx.knn_search(grid, [1.0, 1.0, 1.0], 3, prefilter_overfetch=2.0)
    with _pytest.raises(ValueError, match=">= 1.0"):
        idx.knn_search(
            grid, [1.0, 1.0, 1.0], 3, post_filter="id < 5", prefilter_overfetch=0.5
        )
