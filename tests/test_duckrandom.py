"""DuckDB setseed()/random() bit-parity (r15, VERDICT r14 #6).

``functions/duckrandom.py`` reimplements DuckDB's seeded PRNG from
public knowledge (PCG XSH-RR 64/32, O'Neill 2014) and its observable
two-level seeding; these tests pin the stream AGAINST THE CONTRACTED
DUCKDB ORACLE so version drift in the duckdb package fails loudly —
and pin the planner-level replay shape hnsw_lateral_join_group.test
uses (its expected neighbor ids ARE this stream)."""

import numpy as np
import pytest

from duckdb_vss_spark.functions.duckrandom import (
    DuckRandomConnection,
    stream_values,
)


def _duckdb_stream(seed: float, n_rows: int, n_exprs: int):
    """The oracle: [random()×n_exprs] over range(1, n_rows+1)."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"SELECT setseed({seed})")
    cols = ", ".join("random()" for _ in range(n_exprs))
    rows = con.execute(
        f"SELECT {cols} FROM range(1, {n_rows + 1}) r(i)"
    ).fetchall()
    return np.array(rows, dtype=np.float64)


@pytest.mark.parametrize("seed", [0.1337, 0.0, -0.5, 1.0])
def test_stream_matches_duckdb_oracle(seed):
    oracle = _duckdb_stream(seed, 64, 3)
    conn = DuckRandomConnection(seed)
    seeds = [conn.next_u32() for _ in range(3)]
    ours = np.stack(
        [stream_values(s, np.arange(64)) for s in seeds], axis=1
    )
    assert np.array_equal(ours, oracle)  # bit parity, not allclose


def test_jump_ahead_is_order_independent():
    """Any slice in any order — the partition-independence the 100 TB
    generator story rests on."""
    conn = DuckRandomConnection(0.42)
    s = conn.next_u32()
    full = stream_values(s, np.arange(1000))
    idx = np.array([999, 0, 512, 7, 8, 6])
    assert np.array_equal(full[idx], stream_values(s, idx))


def test_connection_stream_spans_statements():
    """group_large's shape: a SECOND statement's random() instances
    draw the NEXT connection seeds (3, 4, 5) — one engine per
    connection, like DuckDB."""
    import duckdb

    con = duckdb.connect()
    con.execute("SELECT setseed(0.25)")
    first = np.array(
        con.execute("SELECT random(), random(), random() FROM range(1, 9) r(i)").fetchall()
    )
    second = np.array(
        con.execute("SELECT random(), random(), random() FROM range(1, 9) r(i)").fetchall()
    )
    conn = DuckRandomConnection(0.25)
    seeds = [conn.next_u32() for _ in range(6)]
    ours1 = np.stack([stream_values(s, np.arange(8)) for s in seeds[:3]], axis=1)
    ours2 = np.stack([stream_values(s, np.arange(8)) for s in seeds[3:]], axis=1)
    assert np.array_equal(ours1, first)
    assert np.array_equal(ours2, second)


def test_setseed_range_validation():
    with pytest.raises(ValueError, match="between -1.0 and 1.0"):
        DuckRandomConnection(1.5)
    with pytest.raises(ValueError, match="between -1.0 and 1.0"):
        DuckRandomConnection(float("nan"))


def test_planner_seeded_random_shapes(spark):
    """Planner surface: setseed statement, the supported range()
    generator shape, and the LOUD failure on any other random() use
    while seeded (never a silently-diverging nondeterministic
    stream)."""
    from duckdb_vss_spark.plans import VssPlanner

    p = VssPlanner(spark)
    p.sql("SELECT setseed(0.1337);")
    assert p.last_plan == "SETSEED"
    p.sql("CREATE TABLE sr (id INT, v FLOAT[2]);")
    p.sql(
        "INSERT INTO sr SELECT i, [random(), random()]::FLOAT[2] "
        "FROM range(1, 5) as r(i);"
    )
    got = {
        r["id"]: list(r["v"])
        for r in p.sql("SELECT * FROM sr").collect()
    }
    oracle = _duckdb_stream(0.1337, 4, 2).astype(np.float32)
    for i in range(4):
        assert got[i + 1] == pytest.approx(list(oracle[i]), abs=0)
    with pytest.raises(ValueError, match="single"):
        p.sql("INSERT INTO sr VALUES (99, [random(), random()]::FLOAT[2]);")
    p.sql("DROP TABLE sr")


def test_planner_seeded_random_plain_select(spark):
    """Review r15: after setseed, a bare SELECT random() over a range
    generator must follow the deterministic stream through the GENERIC
    sql() path (not fall through to nondeterministic rand()), and a
    filtered shape raises loudly instead of silently diverging."""
    from duckdb_vss_spark.plans import VssPlanner

    p = VssPlanner(spark)
    p.sql("SELECT setseed(0.25);")
    df = p.sql("SELECT i AS i, random() AS r FROM range(1, 5) t(i)")
    got = {r["i"]: r["r"] for r in df.collect()}
    oracle = _duckdb_stream(0.25, 4, 1)
    for i in range(4):
        assert got[i + 1] == oracle[i][0]
    with pytest.raises(ValueError, match="unfiltered"):
        p.sql("SELECT random() AS r FROM range(1, 10) t(i) WHERE i % 2 = 0")
    with pytest.raises(ValueError, match="single"):
        p.sql("SELECT random() AS r")
