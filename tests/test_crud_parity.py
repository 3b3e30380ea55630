"""Replay of the reference's CRUD lifecycle (hnsw_crud.test) through
this engine's surfaces: SQL DDL (CREATE INDEX / SET / PRAGMA), the
table sinks (save/insert/delete), the r13 DML->index hooks, and a
process-restart analogue (reload everything from disk into a FRESH
planner). Spark has no rowids, so the table carries an id column —
the one documented deviation from the reference's script."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.index import load_any_index
from duckdb_vss_spark.plans import VssPlanner
from duckdb_vss_spark.sources.sinks import (
    bind_index,
    delete_where,
    insert_into,
    read_table,
    save_table,
    unbind_indexes,
)


def test_hnsw_crud_lifecycle(spark, tmp_path):
    table = str(tmp_path / "t1")
    # CREATE TABLE t1 (...); INSERT INTO t1 VALUES ([1,2,3])
    save_table(
        spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "rid long, vec array<float>"),
        table,
    )
    read_table(spark, table).createOrReplaceTempView("t1")

    p = VssPlanner(spark)
    p.sql("SET hnsw_enable_experimental_persistence = true;")
    p.sql("CREATE INDEX my_idx ON t1 USING HNSW (vec) WITH (id = 'rid');")
    p.sql("CHECKPOINT;")  # accepted no-op: artifacts commit at write
    assert p.last_plan == "CHECKPOINT"
    idx = p._named["my_idx"]["index"]
    bind_index(table, idx)
    try:
        # INSERT INTO t1 VALUES ([5,5,5]); DELETE FROM t1 WHERE vec = [1,2,3]
        insert_into(
            spark.createDataFrame([(2, [5.0, 5.0, 5.0])], "rid long, vec array<float>"),
            table,
        )
        delete_where(spark, table, F.col("vec") == F.array(*[F.lit(x) for x in (1.0, 2.0, 3.0)]))
        # SELECT * FROM t1 -> only [5,5,5]
        rows = read_table(spark, table).collect()
        assert [list(r["vec"]) for r in rows] == [[5.0, 5.0, 5.0]]
        assert idx.count == 1  # the hook tombstoned the deleted row

        # "restart": fresh planner, artifact reloaded from disk
        p2 = VssPlanner(spark)
        reloaded = load_any_index(spark, idx.path)
        assert reloaded.count == 1
        read_table(spark, table).createOrReplaceTempView("t1")
        p2.register_index("t1", "vec", reloaded)
        df = p2.sql(
            "SELECT rid FROM t1 ORDER BY array_distance(vec, "
            "cast(array(1.0, 2.0, 3.0) as array<float>)) LIMIT 3"
        )
        # EXPLAIN parity: the reference asserts HNSW_INDEX_SCAN survives
        # the restart (hnsw_crud.test:41-44)
        assert p2.last_plan == "HNSW_INDEX_SCAN"
        # the deleted row is gone FROM THE INDEX PATH too: k=3 over a
        # one-live-row index returns exactly the survivor
        assert [r["rid"] for r in df.collect()] == [2]

        # PRAGMA hnsw_compact_index — physically reclaims the tombstone
        # (the planner rebinds the rebuilt handle; the pre-compact one
        # is stale by design, like any dropped-and-recreated artifact)
        p._named["my_idx"]["table"] = "t1"
        p.sql("PRAGMA hnsw_compact_index('my_idx');")
        fresh = p._named["my_idx"]["index"]
        assert not int(fresh.manifest.get("deleted_count", 0))
        assert fresh.count == 1
    finally:
        unbind_indexes(table)
        p.sql("RESET hnsw_enable_experimental_persistence")

def _mk_items(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    return spark.createDataFrame(
        [(int(i), [float(x) for x in rng.randn(8)]) for i in range(300)],
        "item_id long, v array<float>",
    )


def test_catalog_restart(spark, tmp_path):
    from duckdb_vss_spark.operators import knn_search

    items = _mk_items(spark)
    items.createOrReplaceTempView("cat_items")
    cat = str(tmp_path / "catalog")
    p1 = VssPlanner(spark, catalog=cat)
    p1.sql(
        "CREATE INDEX cat_idx ON cat_items USING HNSW (v) "
        "WITH (ef_search = 321, id = 'item_id')"
    )
    p1.sql("CREATE INDEX cat_bq ON cat_items USING BQ (v)")
    qv = [float(x) for x in items.where(F.col("item_id") == 5).first()["v"]]
    lit = ",".join(repr(x) for x in qv)
    q = f"SELECT item_id FROM cat_items ORDER BY v <-> [{lit}]::FLOAT[8] LIMIT 5"

    # "restart": a brand-new planner over the same catalog
    p2 = VssPlanner(spark, catalog=cat)
    assert set(p2._named) == {"cat_idx", "cat_bq"}
    assert p2._named["cat_idx"]["index"]._sql_ef_search == 321
    df = p2.sql(q)
    assert p2.last_plan == "HNSW_INDEX_SCAN"
    want = [
        r["item_id"] for r in knn_search(items, "v", qv, 5).select("item_id").collect()
    ]
    assert [r["item_id"] for r in df.collect()] == want
    # DROP in the restarted planner persists; a third planner sees it
    p2.sql("DROP INDEX cat_bq")
    p3 = VssPlanner(spark, catalog=cat)
    assert set(p3._named) == {"cat_idx"}
    p3.sql("DROP INDEX cat_idx")
    assert VssPlanner(spark, catalog=cat)._named == {}


def test_hooked_session_routes_reference_settings(spark, tmp_path):
    """Under install_sql_extension, SET hnsw_ef_search must reach the
    engine's conf — Spark would otherwise parse SET natively and set a
    meaningless bare key (review r13)."""
    from duckdb_vss_spark.plans import install_sql_extension, uninstall_sql_extension
    from duckdb_vss_spark.session import get_ef_search

    p = VssPlanner(spark)
    install_sql_extension(p)
    try:
        spark.sql("SET hnsw_ef_search = 222")
        assert get_ef_search(spark) == 222
        spark.sql("RESET hnsw_ef_search")
        assert get_ef_search(spark) != 222
        # CHECKPOINT reaches the planner's no-op through the hook too
        assert spark.sql("CHECKPOINT;").count() == 0
    finally:
        uninstall_sql_extension(spark)
        try:
            spark.conf.unset("spark.vss.ef_search")
        except Exception:
            pass
