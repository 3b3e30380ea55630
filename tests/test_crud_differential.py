"""Randomized CRUD differential vs DuckDB (r15).

The scripted lifecycle tests (test_crud_parity.py, test_sql_dml.py)
replay the reference's own statement sequences; this file drives the
SAME SQL text through ``VssPlanner.sql`` and a DuckDB connection in
RANDOM order — seeded, so failures reproduce — and compares the full
table multiset and the DELETE/UPDATE counts after every statement,
plus a routed KNN top-k against DuckDB's answer every few steps (the
index is bound, so every statement exercises the DML hooks the
reference runs inside its table transaction,
src/hnsw/hnsw_index.cpp:391-500).

Vectors are deterministic functions of the row id with distinct
pairwise distances, so top-k sets compare exactly (no tie
ambiguity), and NULLs flow through the predicates to pin the
three-valued WHERE semantics on both engines.
"""

import random

import duckdb
import pytest

from duckdb_vss_spark.plans import VssPlanner


def _vec_sql(rid: int) -> str:
    # distinct pairwise distances: strictly increasing per id, no two
    # ids closer to any probe than each other by symmetry
    return (
        f"[{rid * 1.0 + 0.125}, {rid * 0.5 + 0.25}, "
        f"{rid * 0.25 + 0.0625}]::FLOAT[3]"
    )


def _table_multiset(rows):
    out = []
    for r in rows:
        vec = r[3]
        out.append(
            (
                r[0],
                r[1],
                None if r[2] is None else round(float(r[2]), 9),
                None if vec is None else tuple(round(float(x), 5) for x in vec),
            )
        )
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed", [1337, 20260816])
def test_random_crud_sequence_matches_duckdb(spark, seed):
    rng = random.Random(seed)
    p = VssPlanner(spark)
    con = duckdb.connect()
    tname = f"crud_diff_{seed}"
    ddl = f"CREATE TABLE {tname} (id BIGINT, grp BIGINT, val DOUBLE, vec FLOAT[3])"
    p.sql(ddl)
    con.execute(ddl)
    p.sql("SET hnsw_enable_experimental_persistence = true")
    try:
        next_id = 0
        live = 0

        def run_both(stmt: str):
            sdf = p.sql(stmt)
            dres = con.execute(stmt)
            return sdf, dres

        # seed rows, then the index, so every later statement drives
        # the bound-index hooks
        first = ", ".join(
            f"({i}, {i % 5}, {i * 0.75}, {_vec_sql(i)})" for i in range(12)
        )
        run_both(f"INSERT INTO {tname} VALUES {first}")
        next_id, live = 12, 12
        p.sql(f"CREATE INDEX {tname}_ix ON {tname} USING HNSW (vec) WITH (id='id')")

        for step in range(40):
            kind = rng.choice(["insert", "insert", "delete", "update", "update"])
            if kind == "insert" or live < 4:
                vals = []
                for _ in range(rng.randint(1, 5)):
                    val = "NULL" if rng.random() < 0.2 else f"{next_id * 0.75}"
                    vals.append(
                        f"({next_id}, {next_id % 5}, {val}, {_vec_sql(next_id)})"
                    )
                    next_id += 1
                stmt = f"INSERT INTO {tname} VALUES {', '.join(vals)}"
                run_both(stmt)
            elif kind == "delete":
                pred = rng.choice(
                    [
                        f"grp = {rng.randint(0, 4)}",
                        f"val < {rng.uniform(0, next_id * 0.75):.4f}",
                        f"id % 7 = {rng.randint(0, 6)}",
                        f"val > {rng.uniform(0, next_id * 0.75):.4f} "
                        f"AND grp = {rng.randint(0, 4)}",
                    ]
                )
                stmt = f"DELETE FROM {tname} WHERE {pred}"
                sdf, dres = run_both(stmt)
                n_spark = sdf.first()["Count"]
                n_duck = dres.fetchone()[0]
                assert n_spark == n_duck, (stmt, n_spark, n_duck)
            else:
                setter = rng.choice(
                    [
                        "val = val + 1",
                        "grp = (grp + 1) % 5",
                        "val = NULL",
                        "val = grp * 2.5",
                    ]
                )
                pred = rng.choice(
                    [
                        f"grp = {rng.randint(0, 4)}",
                        f"id % 5 = {rng.randint(0, 4)}",
                        f"val >= {rng.uniform(0, next_id * 0.75):.4f}",
                    ]
                )
                stmt = f"UPDATE {tname} SET {setter} WHERE {pred}"
                sdf, dres = run_both(stmt)
                n_spark = sdf.first()["Count"]
                n_duck = dres.fetchone()[0]
                assert n_spark == n_duck, (stmt, n_spark, n_duck)

            q = f"SELECT id, grp, val, vec FROM {tname}"
            srows = [
                (r["id"], r["grp"], r["val"], r["vec"])
                for r in p.sql(q).collect()
            ]
            drows = con.execute(q).fetchall()
            live = len(drows)
            assert _table_multiset(srows) == _table_multiset(drows), (
                f"step {step}: table multiset diverged after {stmt!r}"
            )

            if step % 5 == 4 and live >= 3:
                probe = (
                    f"[{rng.uniform(0, next_id):.4f}, "
                    f"{rng.uniform(0, next_id / 2):.4f}, "
                    f"{rng.uniform(0, next_id / 4):.4f}]::FLOAT[3]"
                )
                knn = (
                    f"SELECT id FROM {tname} "
                    f"ORDER BY array_distance(vec, {probe}) LIMIT 3"
                )
                sdf = p.sql(knn)
                assert p.last_plan == "HNSW_INDEX_SCAN", p.last_plan
                got = [r["id"] for r in sdf.collect()]
                want = [r[0] for r in con.execute(knn).fetchall()]
                assert got == want, (
                    f"step {step}: routed KNN diverged for {knn!r}: "
                    f"{got} vs {want}"
                )
    finally:
        p.sql(f"DROP TABLE {tname}")
        p.sql("RESET hnsw_enable_experimental_persistence")
        con.close()
