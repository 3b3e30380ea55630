"""Verbatim SQL DML through the planner (r14, VERDICT r13 #1): the
reference's CRUD statements — CREATE TABLE / INSERT INTO / DELETE FROM
/ DROP TABLE (test/sql/hnsw/hnsw_crud.test:10-30,
hnsw_insert.test:12-52) — run unmodified through ``VssPlanner.sql``
over path-registered parquet tables, driving the sink surface
(sources/sinks.py) and therefore the bound-index DML hooks."""

import os

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.plans import VssPlanner
from duckdb_vss_spark.sources import sinks


def test_hnsw_crud_test_verbatim(spark):
    """The hnsw_crud.test script line by line (the id column is the one
    documented deviation — Spark has no rowids)."""
    p = VssPlanner(spark)
    p.sql("SET hnsw_enable_experimental_persistence = true;")
    try:
        p.sql("CREATE TABLE t1 (id BIGINT, vec FLOAT[3]);")
        assert p.last_plan == "CREATE_TABLE"
        p.sql("INSERT INTO t1 VALUES (1, array[1.0, 2.0, 3.0]);")
        p.sql("CREATE INDEX my_idx ON t1 USING HNSW (vec) WITH (id = 'id');")
        p.sql("CHECKPOINT;")
        p.sql("INSERT INTO t1 VALUES (2, array[5.0, 5.0, 5.0]);")
        out = p.sql("DELETE FROM t1 WHERE vec = array[1.0, 2.0, 3.0];")
        assert out.first()["Count"] == 1
        rows = p.sql("SELECT * FROM t1;").collect()
        assert [list(r["vec"]) for r in rows] == [[5.0, 5.0, 5.0]]
        df = p.sql(
            "SELECT * FROM t1 ORDER BY array_distance(vec, [1,2,3]::FLOAT[3]) LIMIT 3;"
        )
        assert p.last_plan == "HNSW_INDEX_SCAN"
        got = df.collect()
        assert [list(r["vec"]) for r in got] == [[5.0, 5.0, 5.0]]
        p.sql("PRAGMA hnsw_compact_index('my_idx');")
        ix = p._named["my_idx"]["index"]
        assert ix.count == 1 and not int(ix.manifest.get("deleted_count", 0))
        p.sql("DROP TABLE t1;")
        assert "t1" not in {r["name"] for r in []}  # no error = dropped
    finally:
        p.sql("RESET hnsw_enable_experimental_persistence")


def test_insert_select_from_self(spark, tmp_path):
    """hnsw_insert.test-style INSERT INTO t SELECT ... FROM t: the
    index hook must receive exactly the appended rows, not a
    re-execution of the (now doubled) self-referencing plan."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE selfy (id BIGINT, vec FLOAT[4]);")
    p.sql(
        "INSERT INTO selfy VALUES (1, array[1.0,0.0,0.0,0.0]), "
        "(2, array[0.0,1.0,0.0,0.0]), (3, array[0.0,0.0,1.0,0.0]);"
    )
    p.sql("CREATE INDEX selfy_idx ON selfy USING HNSW (vec) WITH (id='id');")
    p.sql("INSERT INTO selfy SELECT id + 10, vec FROM selfy;")
    assert p.sql("SELECT count(*) AS c FROM selfy").first()["c"] == 6
    ix = p._named["selfy_idx"]["index"]
    assert ix.count == 6  # 3 original + exactly the 3 appended
    df = p.sql(
        "SELECT id FROM selfy ORDER BY vec <-> [1,0,0,0]::FLOAT[4] LIMIT 2"
    )
    assert p.last_plan == "HNSW_INDEX_SCAN"
    assert {r["id"] for r in df.collect()} == {1, 11}
    p.sql("DROP INDEX selfy_idx")
    p.sql("DROP TABLE selfy")


def test_insert_column_list_fills_nulls(spark):
    p = VssPlanner(spark)
    p.sql("CREATE TABLE partial (a BIGINT, b VARCHAR, c DOUBLE);")
    p.sql("INSERT INTO partial (c, a) VALUES (2.5, 7);")
    row = p.sql("SELECT * FROM partial").first()
    assert (row["a"], row["b"], row["c"]) == (7, None, 2.5)
    p.sql("DROP TABLE partial")


def test_delete_without_where_and_counts(spark):
    p = VssPlanner(spark)
    p.sql("CREATE TABLE wipe (x INTEGER);")
    p.sql("INSERT INTO wipe VALUES (1), (2), (3);")
    assert p.sql("DELETE FROM wipe;").first()["Count"] == 3
    assert p.sql("SELECT count(*) AS c FROM wipe").first()["c"] == 0
    # delete on the empty table is a 0-count no-op
    assert p.sql("DELETE FROM wipe WHERE x = 9").first()["Count"] == 0
    p.sql("DROP TABLE wipe")


def test_create_table_errors_and_if_clauses(spark):
    p = VssPlanner(spark)
    p.sql("CREATE TABLE dup (x INTEGER);")
    with pytest.raises(ValueError, match="already exists"):
        p.sql("CREATE TABLE dup (x INTEGER);")
    p.sql("CREATE TABLE IF NOT EXISTS dup (x INTEGER);")  # no-op
    p.sql("DROP TABLE dup")
    p.sql("DROP TABLE IF EXISTS dup")  # no-op
    with pytest.raises(ValueError, match="at least one column"):
        p.sql("CREATE TABLE empty ( );")


def test_insert_unknown_column_and_arity_errors(spark):
    p = VssPlanner(spark)
    p.sql("CREATE TABLE narrow (a BIGINT, b DOUBLE);")
    with pytest.raises(ValueError, match="not in table"):
        p.sql("INSERT INTO narrow (a, zzz) VALUES (1, 2);")
    with pytest.raises(ValueError, match="target column"):
        p.sql("INSERT INTO narrow SELECT 1")
    p.sql("DROP TABLE narrow")


def test_unregistered_table_falls_through(spark):
    """DML naming a table the planner doesn't own keeps raw Spark
    semantics (here: an analysis error, not a planner crash)."""
    p = VssPlanner(spark)
    with pytest.raises(Exception):
        p.sql("DELETE FROM no_such_table WHERE x = 1")


def test_duck_type_translation(spark):
    p = VssPlanner(spark)
    p.sql(
        "CREATE TABLE typed (i INTEGER, b BIGINT, s VARCHAR(20), "
        "f REAL, d DOUBLE, t TEXT NOT NULL, v FLOAT[2], dc DECIMAL(10,2));"
    )
    schema = {f.name: f.dataType.simpleString() for f in spark.table("typed").schema.fields}
    assert schema == {
        "i": "int", "b": "bigint", "s": "string", "f": "float",
        "d": "double", "t": "string", "v": "array<float>",
        "dc": "decimal(10,2)",
    }
    p.sql("DROP TABLE typed")


def test_with_option_tokenizer_quoted_values(spark):
    """VERDICT r13 #7: quoted option values containing ')' or ',' or
    an escaped quote must survive the WITH(...) parse."""
    opts = VssPlanner._parse_with_options(
        "metric = 'l2sq', id = 'we)ird, name', note = 'it''s fine', m = 16"
    )
    assert opts == {
        "metric": "l2sq", "id": "we)ird, name", "note": "it's fine", "m": 16,
    }
    with pytest.raises(ValueError, match="must be an integer"):
        VssPlanner._parse_with_options("m = 'abc'")
    with pytest.raises(ValueError, match="at least"):
        VssPlanner._parse_with_options("ef_construction = 0")
    with pytest.raises(ValueError, match="key = value"):
        VssPlanner._parse_with_options("metric")


def test_catalog_restart_restores_tables_and_hooks(spark, tmp_path):
    """The durable catalog (r13) now carries DML-able tables too: a
    fresh planner over the same catalog re-registers the table view,
    reloads the index, and re-binds the DML hook — the reference's
    restart in hnsw_crud.test:33-47."""
    cat = str(tmp_path / "cat")
    p1 = VssPlanner(spark, catalog=cat)
    p1.sql("CREATE TABLE persisted (id BIGINT, vec FLOAT[3]);")
    p1.sql("INSERT INTO persisted VALUES (1, array[1.0,0.0,0.0]), (2, array[0.0,1.0,0.0]);")
    p1.sql("CREATE INDEX per_idx ON persisted USING HNSW (vec) WITH (id='id');")
    table_path = p1._tables["persisted"]["path"]
    sinks.unbind_indexes(table_path)  # simulate process death

    p2 = VssPlanner(spark, catalog=cat)
    assert "persisted" in p2._tables
    assert set(p2._named) == {"per_idx"}
    # the reloaded binding propagates DML to the reloaded index
    p2.sql("INSERT INTO persisted VALUES (3, array[0.0,0.0,1.0]);")
    assert p2._named["per_idx"]["index"].count == 3
    df = p2.sql(
        "SELECT id FROM persisted ORDER BY vec <-> [0,0,1]::FLOAT[3] LIMIT 1"
    )
    assert p2.last_plan == "HNSW_INDEX_SCAN"
    assert df.first()["id"] == 3
    out = p2.sql("DELETE FROM persisted WHERE id = 1;")
    assert out.first()["Count"] == 1
    assert p2._named["per_idx"]["index"].count == 2
    p2.sql("DROP TABLE persisted")
    assert "persisted" not in VssPlanner(spark, catalog=cat)._tables


def test_drop_table_unregisters_but_keeps_user_paths(spark, tmp_path):
    """DROP TABLE on a user-registered path unregisters without
    deleting the user's data."""
    path = str(tmp_path / "mine")
    spark.createDataFrame([(1,)], "x int").write.parquet(path)
    p = VssPlanner(spark)
    p.register_table("mine", path)
    assert p.sql("SELECT count(*) AS c FROM mine").first()["c"] == 1
    p.sql("DROP TABLE mine")
    assert os.path.isdir(path)  # data intact
    assert "mine" not in p._tables


def test_create_index_error_shapes_reference_parity(spark):
    """The reference's remaining Binder error shapes
    (hnsw_options.test / hnsw_index_plan.cpp:33-80): unknown option,
    bad metric, duplicate index name — wording parity pinned."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE errt (id BIGINT, vec FLOAT[3]);")
    p.sql("INSERT INTO errt VALUES (1, array[1.0,2.0,3.0]), (2, array[2.0,3.0,4.0]);")
    try:
        with pytest.raises(ValueError, match="Unknown option for HNSW index: 'bogus'"):
            p.sql("CREATE INDEX e1 ON errt USING HNSW (vec) WITH (bogus = 3)")
        with pytest.raises(ValueError, match="must be one of: 'cosine', 'ip', 'l2sq'"):
            p.sql("CREATE INDEX e2 ON errt USING HNSW (vec) WITH (metric = 'hammmm', id='id')")
        with pytest.raises(ValueError, match="Unknown option for BQ index: 'm'"):
            p.sql("CREATE INDEX e3 ON errt USING BQ (vec) WITH (m = 8)")
        p.sql("CREATE INDEX edup ON errt USING HNSW (vec) WITH (id='id')")
        with pytest.raises(ValueError, match="already exists"):
            p.sql("CREATE INDEX edup ON errt USING HNSW (vec) WITH (id='id')")
        p.sql("DROP INDEX edup")
        with pytest.raises(ValueError, match="does not exist"):
            p.sql("DROP INDEX edup")
        with pytest.raises(ValueError, match="does not exist"):
            p.sql("PRAGMA hnsw_compact_index('edup')")
    finally:
        p.sql("DROP INDEX IF EXISTS edup")
        p.sql("DROP TABLE errt")


def test_with_options_fuzz_roundtrip(spark):
    """Fuzz over WITH(...) option strings (VERDICT r13 #7): any
    key = 'value' set — values containing parens, commas, equals and
    escaped quotes — must tokenize back exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    int_opts = set(VssPlanner._INT_OPTS)
    key_st = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=10
    ).filter(lambda k: k not in int_opts)
    val_st = st.one_of(
        st.integers(-1000, 1000),
        st.text(
            alphabet="abcXYZ 019_()[],=;'\"-.", min_size=0, max_size=20
        ),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.dictionaries(key_st, val_st, min_size=1, max_size=6))
    def check(opts):
        raw = ", ".join(
            f"{k} = "
            + (
                str(v)
                if isinstance(v, int)
                else "'" + v.replace("'", "''") + "'"
            )
            for k, v in opts.items()
        )
        parsed = VssPlanner._parse_with_options(raw)
        assert set(parsed) == set(opts)
        for k, v in opts.items():
            assert parsed[k] == (str(v) if isinstance(v, int) else v)

    check()

    # the integer options keep their Binder validation under fuzzing too
    for k in sorted(int_opts):
        with pytest.raises(ValueError, match="must be an integer"):
            VssPlanner._parse_with_options(f"{k} = 'x,y(z'")


def test_update_statement_verbatim(spark):
    """UPDATE t SET ... WHERE ... (DuckDB-host CRUD surface): verbatim
    through the planner over a registered table, with bound-index
    propagation via the O(batch) versioned path."""
    from duckdb_vss_spark.index.pq import create_pq_index

    p = VssPlanner(spark)
    p.sql("CREATE TABLE upd (id BIGINT, vec FLOAT[3], tag VARCHAR);")
    p.sql(
        "INSERT INTO upd VALUES (1, array[1.0,0.0,0.0], 'a'), "
        "(2, array[0.0,1.0,0.0], 'b'), (3, array[0.0,0.0,1.0], 'c');"
    )
    out = p.sql("UPDATE upd SET tag = 'B' WHERE id = 2;")
    assert p.last_plan == "UPDATE" and out.first()["Count"] == 1
    got = {r["id"]: r["tag"] for r in p.sql("SELECT id, tag FROM upd").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
    # vector update propagates to a bound quantized index (versioned)
    path = p._tables["upd"]["path"]
    ix = create_pq_index(
        spark, spark.read.parquet(path), "vec", "id",
        p._ddl_dir + "/upd_pq", m=3, ksub=2,
    )
    sinks.bind_index(path, ix)
    try:
        p.sql("UPDATE upd SET vec = array[9.0, 9.0, 9.0] WHERE id = 1;")
        assert ix.count == 3
        assert int(ix.manifest.get("versioned_dead", 0)) == 1
        table = spark.read.parquet(path)
        top = ix.knn_search(
            [9.0, 9.0, 9.0], 1, rerank=ix.count, source=table
        ).first()
        assert top["id"] == 1 and top["dist"] == 0.0
        # updating the bound id column is refused with guidance
        with pytest.raises(ValueError, match="may not modify"):
            p.sql("UPDATE upd SET id = id + 10 WHERE id = 3")
    finally:
        sinks.unbind_indexes(path)
    p.sql("DROP TABLE upd")


def test_hnsw_insert_wal_replay_verbatim(spark, tmp_path):
    """hnsw_insert_wal.test statement-for-statement: CREATE INDEX over
    an empty table, count 0, restart, INSERT, count grows, restart,
    counts survive — the durable catalog + table persistence play the
    role of the reference's WAL/checkpoint storage."""
    cat = str(tmp_path / "waldb")

    def restart():
        return VssPlanner(spark, catalog=cat)

    p = restart()
    p.sql("SET hnsw_enable_experimental_persistence = true;")
    try:
        p.sql("CREATE TABLE t1 (id BIGINT, vec FLOAT[3]);")
        p.sql("CREATE INDEX my_idx ON t1 USING HNSW (vec) WITH (id='id');")
        assert p.sql(
            "SELECT count FROM pragma_hnsw_index_info()"
        ).first()["count"] == 0
        p.sql("CHECKPOINT;")
        p = restart()
        p.sql("INSERT INTO t1 VALUES (1, array_value(1.0, 2.0, 3.0));")
        p.sql("INSERT INTO t1 VALUES (2, array_value(4.0, 5.0, 6.0));")
        assert p.sql(
            "SELECT count FROM pragma_hnsw_index_info()"
        ).first()["count"] == 2
        p = restart()
        assert p.sql(
            "SELECT count FROM pragma_hnsw_index_info()"
        ).first()["count"] == 2
        p.sql("INSERT INTO t1 VALUES (3, array_value(7.0, 8.0, 9.0));")
        assert p.sql(
            "SELECT count FROM pragma_hnsw_index_info()"
        ).first()["count"] == 3
        p = restart()
        assert p.sql(
            "SELECT count FROM pragma_hnsw_index_info()"
        ).first()["count"] == 3
        p.sql("DROP TABLE t1")
    finally:
        p.sql("RESET hnsw_enable_experimental_persistence")


def test_catalog_restart_auto_resolves_pending_dml(spark, tmp_path):
    """A process that dies between table commit and index update leaves
    a pending_dml journal; the NEXT planner over the catalog replays it
    on load — the reference's WAL playback on restart."""
    from duckdb_vss_spark.index.manifest import set_pending

    cat = str(tmp_path / "healdb")
    p1 = VssPlanner(spark, catalog=cat)
    p1.sql("CREATE TABLE h (id BIGINT, vec FLOAT[3]);")
    p1.sql(
        "INSERT INTO h VALUES (1, array[1.0,0.0,0.0]), (2, array[0.0,1.0,0.0]);"
    )
    p1.sql("CREATE INDEX h_idx ON h USING HNSW (vec) WITH (id='id');")
    ix = p1._named["h_idx"]["index"]
    table_path = p1._tables["h"]["path"]
    # simulate the crash: the table lost row 1, the index never heard
    staged = str(tmp_path / "dead_ids")
    spark.createDataFrame([(1,)], "id long").write.parquet(staged)
    import shutil as _sh

    import pyspark.sql.functions as _F

    kept = spark.read.parquet(table_path).where(_F.col("id") != 1)
    tmp = table_path + ".__x__"
    kept.write.parquet(tmp)
    _sh.rmtree(table_path)
    import os as _os

    _os.rename(tmp, table_path)
    ix.manifest = set_pending(
        ix.path, ix.manifest,
        {"op": "delete_where", "table": table_path, "ids": staged,
         "token": "crash1"},
    )
    sinks.unbind_indexes(table_path)

    p2 = VssPlanner(spark, catalog=cat)  # auto-heals on load
    fresh = p2._named["h_idx"]["index"]
    assert fresh.count == 1
    assert not fresh.manifest.get("pending_dml")
    df = p2.sql("SELECT id FROM h ORDER BY vec <-> [1,0,0]::FLOAT[3] LIMIT 1")
    assert p2.last_plan == "HNSW_INDEX_SCAN"
    assert df.first()["id"] == 2  # row 1 gone from table AND index
    p2.sql("DROP TABLE h")


def test_ctas_registers_table_and_database_size(spark):
    """CREATE TABLE ... AS SELECT lands as a planner table (DML-able,
    indexable), and pragma_database_size() tracks the real footprint:
    it grows on CREATE INDEX and returns on DROP INDEX — the
    storage-reclaim property hnsw_reclaim_storage.test_slow pins."""
    p = VssPlanner(spark)
    # 6000 rows so the index artifact occupies MULTIPLE 256 KiB blocks
    # — the reclaim assertions below then actually bind (at toy sizes
    # table and index round to the same single block)
    p.sql(
        "CREATE TABLE ctas AS SELECT i as i, "
        "array_value(i, i, i)::FLOAT[3] as vec FROM range(6000) tbl(i)"
    )
    assert p.last_plan == "CREATE_TABLE_AS"
    assert "ctas" in p._tables and not p._tables["ctas"]["auto_rowid"]
    assert p.sql("SELECT count(*) AS n FROM ctas").first()["n"] == 6000
    # DML works on the CTAS table
    p.sql("DELETE FROM ctas WHERE i >= 5900")
    assert p.sql("SELECT count(*) AS n FROM ctas").first()["n"] == 5900

    base = p.sql("SELECT total_blocks FROM pragma_database_size()").first()[
        "total_blocks"
    ]
    p.sql("CREATE INDEX ctas_idx ON ctas USING HNSW (vec)")
    with_idx = p.sql(
        "SELECT total_blocks, used_blocks, block_size "
        "FROM pragma_database_size()"
    ).first()
    assert with_idx["block_size"] == 262144
    assert with_idx["total_blocks"] > base  # the index occupies blocks
    p.sql("DROP INDEX ctas_idx")
    after = p.sql(
        "SELECT total_blocks FROM pragma_database_size()"
    ).first()["total_blocks"]
    assert after < with_idx["total_blocks"]  # DROP released them
    assert after <= base + 1  # back to (within a block of) baseline
    # CTAS wrapping the pragma TVF stays a planner table
    p.sql("CREATE TABLE sizes AS SELECT total_blocks FROM pragma_database_size()")
    assert "sizes" in p._tables
    assert p.sql("SELECT count(*) AS n FROM sizes").first()["n"] == 1
    # no integral column -> hidden auto rowid, excluded from the view
    p.sql("CREATE TABLE names AS SELECT 'a' AS s")
    assert p._tables["names"]["auto_rowid"]
    assert p.sql("SELECT * FROM names").columns == ["s"]
    for t in ("ctas", "sizes", "names"):
        p.sql(f"DROP TABLE {t}")


def test_ctas_survives_catalog_restart(spark, tmp_path):
    """A CTAS table rides the durable catalog like a declared one:
    a fresh planner over the same catalog serves it, routes its index,
    and accepts further DML."""
    cat = str(tmp_path / "cat")
    p1 = VssPlanner(spark, catalog=cat)
    p1.sql(
        "CREATE TABLE ct AS SELECT i as i, "
        "array_value(i, i, i)::FLOAT[3] as vec FROM range(50) tbl(i)"
    )
    p1.sql("CREATE INDEX ct_idx ON ct USING HNSW (vec)")
    p2 = VssPlanner(spark, catalog=cat)
    assert p2.sql("SELECT count(*) AS n FROM ct").first()["n"] == 50
    df = p2.sql("SELECT i FROM ct ORDER BY vec <-> [7.0,7.0,7.0]::FLOAT[3] LIMIT 1")
    assert p2.last_plan == "HNSW_INDEX_SCAN"
    assert df.first()["i"] == 7
    p2.sql("INSERT INTO ct VALUES (99, array[99.0, 99.0, 99.0])")
    assert p2.sql("SELECT count(*) AS n FROM ct").first()["n"] == 51


def test_ctas_parenthesized_and_cte_forms(spark):
    """DuckDB-valid CTAS bodies beyond a bare SELECT — parenthesized
    and WITH-CTE — must land as planner tables, not fall through to a
    raw-Spark catalog table with divergent semantics."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE paren AS (SELECT 1 AS i, 'a' AS s)")
    assert "paren" in p._tables
    p.sql("CREATE TABLE cte AS WITH c AS (SELECT 2 AS i) SELECT i FROM c")
    assert "cte" in p._tables
    assert p.sql("SELECT i FROM cte").first()["i"] == 2
    p.sql("DROP TABLE paren")
    p.sql("DROP TABLE cte")


def test_create_or_replace_table_forms(spark):
    """CREATE OR REPLACE TABLE (ADVICE r14): both the CTAS and the
    column-spec spellings replace an existing planner table instead of
    silently falling through to a raw Spark catalog table."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE orp AS SELECT 1 AS i")
    p.sql("CREATE OR REPLACE TABLE orp AS SELECT i AS i FROM range(5) t(i)")
    assert p.last_plan == "CREATE_TABLE_AS"
    assert p.sql("SELECT count(*) AS n FROM orp").first()["n"] == 5
    # column-spec replace: fresh empty table with the new schema
    p.sql("CREATE OR REPLACE TABLE orp (id BIGINT, s VARCHAR)")
    assert p.last_plan == "CREATE_TABLE"
    assert p.sql("SELECT count(*) AS n FROM orp").first()["n"] == 0
    assert p.sql("SELECT * FROM orp").columns == ["id", "s"]
    # OR REPLACE on a NEW name is a plain create
    p.sql("CREATE OR REPLACE TABLE orp2 AS SELECT 7 AS i")
    assert p.sql("SELECT i FROM orp2").first()["i"] == 7
    with pytest.raises(ValueError, match="IF NOT EXISTS"):
        p.sql("CREATE OR REPLACE TABLE IF NOT EXISTS orp AS SELECT 1 AS i")
    p.sql("DROP TABLE orp")
    p.sql("DROP TABLE orp2")


def test_ctas_from_first_and_loud_fallthrough(spark):
    """DuckDB's FROM-first CTAS body rewrites to SELECT *; any other
    non-SELECT body raises instead of silently creating a raw Spark
    catalog table (ADVICE r14)."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE src AS SELECT i AS i FROM range(10) t(i)")
    p.sql("CREATE TABLE ff AS FROM src WHERE i < 4")
    assert "ff" in p._tables
    assert p.sql("SELECT count(*) AS n FROM ff").first()["n"] == 4
    with pytest.raises(ValueError, match="FROM-first CTAS with a trailing"):
        p.sql("CREATE TABLE ff2 AS FROM src SELECT i")
    with pytest.raises(ValueError, match="unsupported CTAS body"):
        p.sql("CREATE TABLE ff3 AS TABLE src")
    p.sql("DROP TABLE ff")
    p.sql("DROP TABLE src")


def test_array_call_cast_nested_parens(spark):
    """array(...)::FLOAT[n] with NESTED parens in the element list
    (ADVICE r14: the old regex left the ::FLOAT[n] untranslated and
    Spark's parser rejected it downstream)."""
    p = VssPlanner(spark)
    p.sql(
        "CREATE TABLE nest AS SELECT i AS i, "
        "array_value(cast(i as float), cast(i as float), 0)::FLOAT[3] AS vec "
        "FROM range(4) t(i)"
    )
    rows = p.sql("SELECT vec FROM nest WHERE i = 2").collect()
    assert [list(r["vec"]) for r in rows] == [[2.0, 2.0, 0.0]]
    # inner call inside an UNCAST outer expression still translates
    p.sql("INSERT INTO nest VALUES (9, array_value(9, 9, 9)::FLOAT[3])")
    assert p.sql("SELECT count(*) AS n FROM nest").first()["n"] == 5
    p.sql("DROP TABLE nest")


def test_insert_select_rowid_assignment_distributed(spark, tmp_path):
    """VERDICT r14 #1: a SELECT-shaped INSERT INTO an auto-rowid table
    must assign ids DISTRIBUTEDLY — no global single-partition window
    funneling the whole batch through one task. Pinned observably: the
    append preserves the source's partitioning (multiple parquet files
    land), and ids stay unique past the previous max. VALUES batches
    keep dense sequential ids (bounded literals)."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE rdist AS SELECT 'seed' AS s, cast(0.5 AS DOUBLE) AS x")
    assert p._tables["rdist"]["auto_rowid"]
    path = p._tables["rdist"]["path"]
    files_before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    p.sql(
        "INSERT INTO rdist SELECT concat('r', i) AS s, i * 1.0 AS x "
        "FROM range(0, 100000, 1, 8) t(i)"
    )
    files_after = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    appended = files_after - files_before
    assert len(appended) > 1, (
        "SELECT-shaped INSERT collapsed to one task/file — the rowid "
        f"assignment is not distributed (appended: {sorted(appended)})"
    )
    ids = spark.read.parquet(path).select("__rowid")
    n = ids.count()
    assert n == 100001
    assert ids.distinct().count() == n  # uniqueness is the contract
    # a later VALUES insert still lands past the new max
    p.sql("INSERT INTO rdist VALUES ('v', 9.0)")
    ids2 = spark.read.parquet(path).select("__rowid")
    assert ids2.distinct().count() == 100002
    p.sql("DROP TABLE rdist")


def test_failed_replace_keeps_old_table(spark):
    """Review r15: DuckDB keeps the old table when CREATE OR REPLACE
    fails — the replacement must validate AND materialize before the
    old table is touched, in both the CTAS and column-spec forms."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE keepme (x FLOAT[2])")
    p.sql("INSERT INTO keepme VALUES ([1.0, 2.0]::FLOAT[2])")
    with pytest.raises(Exception):
        p.sql("CREATE OR REPLACE TABLE keepme AS SELECT no_such_col FROM keepme")
    rows = p.sql("SELECT * FROM keepme").collect()
    assert [list(r["x"]) for r in rows] == [[1.0, 2.0]]
    with pytest.raises(ValueError, match="unsupported CREATE TABLE"):
        p.sql("CREATE OR REPLACE TABLE keepme (PRIMARY KEY (y), y INT)")
    assert p.sql("SELECT count(*) AS n FROM keepme").first()["n"] == 1
    # a column type the schema parser rejects also keeps the old table
    with pytest.raises(Exception):
        p.sql("CREATE OR REPLACE TABLE keepme (y SOME_BOGUS_TYPE<...>)")
    assert p.sql("SELECT count(*) AS n FROM keepme").first()["n"] == 1
    p.sql("DROP TABLE keepme")


def test_self_referential_replace(spark):
    """CREATE OR REPLACE TABLE t AS SELECT ... FROM t reads the OLD t
    (review r15: the old entry must stay live until the new data is
    materialized)."""
    p = VssPlanner(spark)
    p.sql("CREATE TABLE selfrep AS SELECT i AS i FROM range(1, 4) t(i)")
    p.sql("CREATE OR REPLACE TABLE selfrep AS SELECT i * 10 AS i FROM selfrep")
    got = sorted(r["i"] for r in p.sql("SELECT i FROM selfrep").collect())
    assert got == [10, 20, 30]
    p.sql("DROP TABLE selfrep")


def test_replace_drops_dependent_index(spark):
    """Dependent indexes go WITH the table (review r15, DuckDB's
    implicit cascade): after CREATE OR REPLACE, a KNN query must NOT
    route through the stale index over the OLD vectors, DROP INDEX
    reports the index gone, and the name is free for re-CREATE."""
    p = VssPlanner(spark)
    p.sql("SET hnsw_enable_experimental_persistence = true")
    try:
        p.sql("CREATE TABLE swapt (vec FLOAT[2])")
        p.sql(
            "INSERT INTO swapt SELECT [cast(i as float), cast(i as float)]"
            "::FLOAT[2] FROM range(0, 20) r(i)"
        )
        p.sql("CREATE INDEX swix ON swapt USING HNSW (vec)")
        assert "swix" in p._named
        p.sql(
            "CREATE OR REPLACE TABLE swapt AS "
            "SELECT [cast(i + 100 as float), cast(i + 100 as float)]"
            "::FLOAT[2] AS vec FROM range(0, 20) r(i)"
        )
        assert "swix" not in p._named
        assert not any(k[0] == "swapt" for k in p._indexes)
        df = p.sql(
            "SELECT vec FROM swapt "
            "ORDER BY array_distance(vec, [0.0, 0.0]::FLOAT[2]) LIMIT 1"
        )
        assert p.last_plan != "HNSW_INDEX_SCAN"  # no stale route
        assert list(df.first()["vec"]) == [100.0, 100.0]  # NEW data
        with pytest.raises(ValueError, match="does not exist"):
            p.sql("DROP INDEX swix")
        # the name is free again, and the fresh index serves NEW data
        p.sql("CREATE INDEX swix ON swapt USING HNSW (vec)")
        df2 = p.sql(
            "SELECT vec FROM swapt "
            "ORDER BY array_distance(vec, [0.0, 0.0]::FLOAT[2]) LIMIT 1"
        )
        assert p.last_plan == "HNSW_INDEX_SCAN"
        assert list(df2.first()["vec"]) == [100.0, 100.0]
        p.sql("DROP INDEX swix")
        p.sql("DROP TABLE swapt")
    finally:
        p.sql("RESET hnsw_enable_experimental_persistence")


def test_drop_table_drops_dependent_index(spark):
    """DROP TABLE removes dependent indexes too (review r15)."""
    p = VssPlanner(spark)
    p.sql("SET hnsw_enable_experimental_persistence = true")
    try:
        p.sql("CREATE TABLE dropt (vec FLOAT[2])")
        p.sql("INSERT INTO dropt VALUES ([1.0, 1.0]::FLOAT[2])")
        p.sql("CREATE INDEX drix ON dropt USING HNSW (vec)")
        p.sql("DROP TABLE dropt")
        assert "drix" not in p._named
        with pytest.raises(ValueError, match="does not exist"):
            p.sql("DROP INDEX drix")
    finally:
        p.sql("RESET hnsw_enable_experimental_persistence")


def test_replace_cascade_survives_restart(spark, tmp_path):
    """Review r15 follow-through: the index dropped by CREATE OR
    REPLACE's implicit cascade must not resurrect from the durable
    catalog on restart."""
    cat = str(tmp_path / "cat")
    p1 = VssPlanner(spark, catalog=cat)
    p1.sql("CREATE TABLE cascades (id BIGINT, vec FLOAT[2]);")
    p1.sql("INSERT INTO cascades VALUES (1, [1.0, 1.0]::FLOAT[2]);")
    p1.sql("CREATE INDEX cas_idx ON cascades USING HNSW (vec) WITH (id='id');")
    p1.sql(
        "CREATE OR REPLACE TABLE cascades AS "
        "SELECT [9.0, 9.0]::FLOAT[2] AS vec"
    )
    assert "cas_idx" not in p1._named
    p2 = VssPlanner(spark, catalog=cat)
    assert "cas_idx" not in p2._named
    assert not any(k[0] == "cascades" for k in p2._indexes)
    rows = p2.sql("SELECT vec FROM cascades").collect()
    assert [list(r["vec"]) for r in rows] == [[9.0, 9.0]]
    p2.sql("DROP TABLE cascades")
