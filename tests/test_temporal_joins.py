"""Unit tests for the temporal join operators (asof_join,
interval_join): semantics DuckDB pins via ASOF JOIN / inequality
joins, exercised here on hand-built frames where the expected matches
are computable by eye."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.operators.asof import asof_join
from duckdb_vss_spark.operators.interval import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            # (id, key, t)
            (1, "a", 100),
            (2, "a", 205),
            (3, "a", 300),
            (4, "b", 50),
            (5, "c", 10),  # key with no right rows at all
        ],
        "id long, key string, t long",
    )
    right = spark.createDataFrame(
        [
            # (rid, key, t, v)
            (10, "a", 90, 1.0),
            (11, "a", 205, 2.0),  # exact tie with left id=2 -> inclusive
            (12, "a", 290, 3.0),
            (13, "b", 60, 4.0),  # after left id=4 -> backward: no match
        ],
        "rid long, key string, t long, v double",
    )
    return left, right


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


class TestAsofJoin:
    def test_backward_inclusive(self, frames):
        left, right = frames
        out = asof_join(left, right, on="t", by="key", right_cols=["rid", "v"])
        got = _rows(out, "id", "rid", "v")
        assert got == [
            (1, 10, 1.0),  # latest t<=100 is 90
            (2, 11, 2.0),  # exact tie 205 matches (inclusive)
            (3, 12, 3.0),
            (4, None, None),  # only right row for b is later
            (5, None, None),  # no right rows for c
        ]

    def test_forward(self, frames):
        left, right = frames
        out = asof_join(
            left, right, on="t", by="key", right_cols=["rid"], direction="forward"
        )
        got = _rows(out, "id", "rid")
        assert got == [
            (1, 11),  # earliest t>=100 is 205
            (2, 11),  # inclusive tie
            (3, None),  # nothing at/after 300 for a
            (4, 13),
            (5, None),
        ]

    def test_tolerance_nulls_far_matches(self, frames):
        left, right = frames
        out = asof_join(
            left, right, on="t", by="key", right_cols=["rid"], tolerance=10
        )
        got = dict(_rows(out, "id", "rid"))
        assert got == {1: 10, 2: 11, 3: 12, 4: None, 5: None}
        out2 = asof_join(
            left, right, on="t", by="key", right_cols=["rid"], tolerance=5
        )
        # gaps of 10 (ids 1 and 3) exceed 5 -> nulled, rows kept
        # (left-join semantics)
        got2 = dict(_rows(out2, "id", "rid"))
        assert got2 == {1: None, 2: 11, 3: None, 4: None, 5: None}

    def test_no_row_tearing_on_null_payload(self, spark):
        # A right row whose carried column is NULL must still be THE
        # match (not leak the previous row's value for that column).
        left = spark.createDataFrame([(1, 100)], "id long, t long")
        right = spark.createDataFrame(
            [(10, 50, 1.0), (11, 80, None)], "rid long, t long, v double"
        )
        out = asof_join(left, right, on="t", right_cols=["rid", "v"])
        [(rid, v)] = _rows(out, "rid", "v")
        assert rid == 11 and v is None

    def test_global_no_by(self, spark):
        left = spark.createDataFrame([(1, 100), (2, 40)], "id long, t long")
        right = spark.createDataFrame([(10, 50), (11, 99)], "rid long, t long")
        out = asof_join(left, right, on="t", right_cols=["rid"])
        assert dict(_rows(out, "id", "rid")) == {1: 11, 2: None}

    def test_validation(self, frames):
        left, right = frames
        with pytest.raises(ValueError):
            asof_join(left, right, on="nope")
        with pytest.raises(ValueError):
            asof_join(left, right, on="t", direction="sideways")
        with pytest.raises(ValueError):
            asof_join(left, right, on="t", right_cols=["missing"])


class TestIntervalJoin:
    def test_pairs_exact_once(self, frames):
        left, right = frames
        out = interval_join(
            left, right, on="t", by="key", lower=-100, upper=0, right_cols=["rid"]
        )
        got = _rows(out, "id", "rid")
        # id=1 t=100 window [0,100]: rids at 90 -> 10
        # id=2 t=205 window [105,205]: 205 -> 11
        # id=3 t=300 window [200,300]: 205,290 -> 11,12
        # id=4 t=50 window [-50,50]: right b at 60 out
        assert got == [(1, 10), (2, 11), (3, 11), (3, 12)]

    def test_symmetric_window_and_boundaries(self, spark):
        left = spark.createDataFrame([(1, 100)], "id long, t long")
        right = spark.createDataFrame(
            [(10, 90), (11, 110), (12, 89), (13, 111)], "rid long, t long"
        )
        out = interval_join(
            left, right, on="t", lower=-10, upper=10, right_cols=["rid"]
        )
        assert [r for (_, r) in _rows(out, "id", "rid")] == [10, 11]

    def test_no_nested_loop_in_plan(self, frames):
        left, right = frames
        out = interval_join(
            left, right, on="t", by="key", lower=-100, upper=0, right_cols=["rid"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_validation(self, frames):
        left, right = frames
        with pytest.raises(ValueError):
            interval_join(left, right, on="t", lower=5, upper=1)


class TestRandomizedCrossCheck:
    """Randomized agreement with a brute-force pure-Python reference —
    the oracle-style check at unit scale, covering tie/boundary
    configurations hand-built cases miss."""

    def _ref_asof(self, left, right, tolerance=None, direction="backward"):
        out = {}
        for (lid, k, lt) in left:
            best = None
            for (rid, rk, rt) in right:
                if rk != k:
                    continue
                ok = rt <= lt if direction == "backward" else rt >= lt
                if not ok:
                    continue
                key = (rt, rid) if direction == "backward" else (-rt, -rid)
                if best is None or key > best[0]:
                    best = (key, rid, rt)
            if best is not None and tolerance is not None:
                if abs(lt - best[2]) > tolerance:
                    best = None
            out[lid] = best[1] if best else None
        return out

    def test_random_frames_agree(self, spark):
        import random

        from duckdb_vss_spark.operators.asof import asof_join

        rng = random.Random(1234)
        for trial in range(3):
            left = [
                (i, f"k{rng.randrange(4)}", rng.randrange(50))
                for i in range(60)
            ]
            right = [
                (1000 + i, f"k{rng.randrange(4)}", rng.randrange(50))
                for i in range(40)
            ]
            # unique (key, t) on the right, as the operator documents
            seen, rdedup = set(), []
            for (rid, k, t) in right:
                if (k, t) not in seen:
                    seen.add((k, t))
                    rdedup.append((rid, k, t))
            ldf = spark.createDataFrame(left, "id long, key string, t long")
            rdf = spark.createDataFrame(rdedup, "rid long, key string, t long")
            for direction in ("backward", "forward"):
                for tol in (None, 7):
                    got = {
                        r.id: r.rid
                        for r in asof_join(
                            ldf, rdf, on="t", by="key", right_cols=["rid"],
                            direction=direction, tolerance=tol,
                        ).collect()
                    }
                    want = self._ref_asof(left, rdedup, tol, direction)
                    assert got == want, (trial, direction, tol)

    def test_interval_random_agree(self, spark):
        import random

        from duckdb_vss_spark.operators.interval import interval_join

        rng = random.Random(99)
        left = [(i, f"k{rng.randrange(3)}", rng.randrange(40)) for i in range(50)]
        right = [
            (1000 + i, f"k{rng.randrange(3)}", rng.randrange(40))
            for i in range(50)
        ]
        ldf = spark.createDataFrame(left, "id long, key string, t long")
        rdf = spark.createDataFrame(right, "rid long, key string, t long")
        lo, hi = -6, 3
        got = sorted(
            (r.id, r.rid)
            for r in interval_join(
                ldf, rdf, on="t", by="key", lower=lo, upper=hi,
                right_cols=["rid"],
            ).collect()
        )
        want = sorted(
            (lid, rid)
            for (lid, lk, lt) in left
            for (rid, rk, rt) in right
            if lk == rk and lt + lo <= rt <= lt + hi
        )
        assert got == want


class TestNullAndFloatSemantics:
    def test_asof_null_on_values_match_duckdb(self, spark):
        """Review r15: SQL ASOF inequality is FALSE for NULL ordering
        values — a NULL-t right row never matches (it was a universal
        backward fallback) and a NULL-t left row keeps its row with no
        match (it inherited the smallest-t right row in forward mode).
        Differential against DuckDB's native ASOF JOIN."""
        import duckdb

        lrows = [(1, 5.0), (2, None), (3, 100.0)]
        rrows = [(1, 10.0, "r10"), (1, None, "rnull"), (3, 50.0, "r50")]
        left = spark.createDataFrame(lrows, "k int, t double")
        right = spark.createDataFrame(rrows, "k int, t double, tag string")
        for direction, op in (("backward", ">="), ("forward", "<=")):
            got = {
                (r["k"], r["t"], r["tag"])
                for r in asof_join(
                    left, right, on="t", by="k", direction=direction
                ).collect()
            }
            con = duckdb.connect()
            con.execute("CREATE TABLE l (k int, t double)")
            con.execute("CREATE TABLE r (k int, t double, tag varchar)")
            con.executemany("INSERT INTO l VALUES (?, ?)", lrows)
            con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
            want = {
                tuple(row)
                for row in con.execute(
                    f"SELECT l.k, l.t, r.tag FROM l ASOF LEFT JOIN r "
                    f"ON l.k = r.k AND l.t {op} r.t"
                ).fetchall()
            }
            con.close()
            assert got == want, (direction, got, want)

    def test_interval_float_bounds(self, spark):
        """Review r15: float lower/upper offsets were silently
        truncated with int() — fractional-gap matches vanished and
        negative look-backs shrank toward zero."""
        left = spark.createDataFrame([(1, 10.0)], "k int, t double")
        right = spark.createDataFrame(
            [(1, 9.6, "a"), (1, 10.4, "b"), (1, 11.2, "c"), (1, 8.9, "d")],
            "k int, t double, tag string",
        )
        got = {
            r["tag"]
            for r in interval_join(
                left, right, on="t", by="k", lower=-0.5, upper=0.5
            ).collect()
        }
        assert got == {"a", "b"}  # pre-fix: between(t+0, t+0) → only exact
        got2 = {
            r["tag"]
            for r in interval_join(
                left, right, on="t", by="k", lower=-2.5, upper=1.5
            ).collect()
        }
        # pre-fix truncation gave [t-2, t+1] = [8, 11], dropping c@11.2
        assert got2 == {"a", "b", "c", "d"}
