"""The reference extension's OWN sqllogictest scripts, replayed
verbatim through VssPlanner (r14, tools/slt.py): 15 of the 16
test/sql/**.test files run statement-for-statement — CREATE TABLE
without id columns (auto-rowid), INSERT ... SELECT over range() cross
products, CREATE INDEX / EXPLAIN-marker asserts / pragmas / SET /
restarts / error-wording asserts, lateral joins with NULL semantics,
the vss_join/vss_match macros, and the slow suite's storage-reclaim
loop (CTAS + pragma_database_size() + loop/endloop).

Excluded: hnsw_lateral_join_group.test (its data generation is
``setseed()`` + DuckDB's seeded ``random()`` — the expected values are
that engine's PRNG stream, unreproducible by specification).

Deviations (skipped-and-counted, never silent): two assertions whose
expected values encode the reference engine's tie order among EQUAL
distances (usearch heap order / DuckDB scan order) rather than
specified semantics — any tie-break is a correct k-NN answer there.
"""

import os
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


def test_reclaim_storage_script(spark, tmp_path):
    """test/sql/slow/hnsw_reclaim_storage.test_slow: DROP INDEX
    physically releases the artifact's blocks and five drop/create
    cycles return to the script's own recorded baselines — storage
    does not leak. Default replay applies the ONE recorded scale
    substitution (slt.RECLAIM_SCALE_SUBS: 1M -> 10k rows + the
    matching probe id) — every assertion keeps its semantics because
    the reclaim checks are relative to baselines the script itself
    records via CTAS over pragma_database_size(). VSS_SLT_SLOW=1 runs
    the file verbatim at 1M rows (~35 min)."""
    name, want_n, deviations = slt.RECLAIM_FILE
    subs = None if os.environ.get("VSS_SLT_SLOW") else slt.RECLAIM_SCALE_SUBS
    r = slt.run_reference_test(
        spark, name, str(tmp_path), deviations=deviations, subs=subs
    )
    assert r.n_ok == want_n, (name, r.n_ok)
    assert len(r.deviated) == len(deviations), (name, r.deviated)


def test_expand_loops_nested_and_unsupported():
    """Loop expansion: substitution happens before the recursive
    expansion (an inner loop may use the outer variable as a bound),
    and an unsupported block directive fails loudly at its own line
    instead of stealing the outer endloop."""
    out = slt._expand_loops(
        ["loop i 1 3", "loop j 0 ${i}", "s ${i}.${j}", "endloop", "endloop"]
    )
    assert out == ["s 1.0", "s 2.0", "s 2.1"]
    with pytest.raises(slt.SltUnsupported, match="foreach"):
        slt._expand_loops(["loop i 0 2", "foreach x a b", "s", "endloop", "endloop"])
    with pytest.raises(slt.SltUnsupported, match="unterminated"):
        slt._expand_loops(["loop i 0 2", "s"])
    with pytest.raises(FileNotFoundError, match="unknown reference script"):
        slt.run_reference_test(None, "no_such_script", "/tmp")
