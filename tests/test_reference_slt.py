"""The reference extension's OWN sqllogictest scripts, replayed
verbatim through VssPlanner (r14, tools/slt.py): 13 of the 14
test/sql/hnsw/*.test files run statement-for-statement — CREATE TABLE
without id columns (auto-rowid), INSERT ... SELECT over range() cross
products, CREATE INDEX / EXPLAIN-marker asserts / pragmas / SET /
restarts / error-wording asserts, lateral joins with NULL semantics,
and the vss_join/vss_match macros.

Excluded: hnsw_lateral_join_group.test (its data generation is
``setseed()`` + DuckDB's seeded ``random()`` — the expected values are
that engine's PRNG stream, unreproducible by specification).

Deviations (skipped-and-counted, never silent): two assertions whose
expected values encode the reference engine's tie order among EQUAL
distances (usearch heap order / DuckDB scan order) rather than
specified semantics — any tie-break is a correct k-NN answer there.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

import slt  # noqa: E402

FILES = slt.REFERENCE_FILES


@pytest.mark.parametrize("name", sorted(FILES))
def test_reference_script_verbatim(spark, tmp_path, name):
    want_n, deviations = FILES[name]
    r = slt.run_reference_test(spark, name, str(tmp_path), deviations=deviations)
    # exact counts: a silently-skipped assertion (or an extra deviation)
    # must fail the replay, not shrink it
    assert r.n_ok == want_n, (name, r.n_ok)
    assert len(r.deviated) == len(deviations), (name, r.deviated)
