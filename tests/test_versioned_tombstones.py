"""Versioned tombstones (r14, VERDICT r13 #4): the quantized upsert
recipe — ``delete_batch(ids, epoch_lt=next)`` + ``add_batch`` at epoch
``next`` — replaces a row version with NO physical rewrite. Row epochs
come from the manifest's file_epochs map (bulk build = 0), so every
scan and executor-side query stream must kill exactly the OLD versions
and serve the new ones. Plain deletes never set the versioned flag, so
the r13 id-only plans are untouched (pinned here too)."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import distance_for_metric
from duckdb_vss_spark.index import tombstones as _tomb

from tests.test_delete_quantized import FAMILIES, _ids_dists


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("embedding").isNotNull())
        .select("vec_id", "embedding")
        .cache()
    )


def _upsert(ix, emb, ids, new_rows_df):
    nxt = int(ix.manifest.get("append_epoch", 0)) + 1
    ix = ix.delete_batch(ids, epoch_lt=nxt)
    return ix.add_batch(new_rows_df)


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_versioned_upsert_family(spark, emb, tmp_path, family):
    create, load, search, join = FAMILIES[family]
    n_total = emb.count()
    ix = create(spark, emb, str(tmp_path / family))

    # replace ids 5 and 11 with NEW vectors (the negation — maximally
    # distinguishable from the old version under every metric here)
    old = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").isin(5, 11)).collect()
    }
    new_rows = spark.createDataFrame(
        [(i, [-x for x in v]) for i, v in old.items()],
        "vec_id long, embedding array<float>",
    )
    ix = _upsert(ix, emb, list(old), new_rows)
    assert ix.count == n_total  # one live version per id
    assert int(ix.manifest.get("versioned_dead", 0)) == 2

    # the CURRENT corpus the index must agree with
    current = emb.where(~F.col("vec_id").isin(5, 11)).unionByName(new_rows)
    dist_fn = distance_for_metric("l2sq")
    qv = [float(x) for x in new_rows.where(F.col("vec_id") == 5).first()[1]]
    want = [
        (r["vec_id"], r["dist"])
        for r in current.withColumn("dist", dist_fn(F.col("embedding"), qv))
        .orderBy("dist", "vec_id")
        .limit(10)
        .select("vec_id", "dist")
        .collect()
    ]
    got = _ids_dists(search(ix, current, qv))
    assert got == want, f"{family}: new version not served exactly"
    assert got[0][0] == 5 and got[0][1] == 0.0  # the new vector IS id 5

    # the OLD version is dead: searching the old vector must not find a
    # zero-distance row (the old physical row would be exactly 0)
    got_old = _ids_dists(search(ix, current, old[5]))
    assert all(d > 0.0 for _i, d in got_old), f"{family}: old version leaked"

    # executor-side multi-query stream resolves epochs PER FILE
    if join is not None:
        q = spark.createDataFrame(
            [(1, qv), (2, old[11])], "qid long, qvec array<double>"
        )
        out = join(ix, current, q)
        top = {
            r["qid"]: (r["vec_id"], r["dist"])
            for r in out.where(F.col("rn") == 1).collect()
        }
        assert top[1] == (5, 0.0), f"{family}: stream missed the new version"
        assert top[2][1] > 0.0, f"{family}: stream leaked the old version"

    # a SECOND upsert of id 5 — the accumulator case
    v2 = spark.createDataFrame(
        [(5, [2.0 * x for x in qv])], "vec_id long, embedding array<float>"
    )
    ix = _upsert(ix, emb, [5], v2)
    assert ix.count == n_total
    assert int(ix.manifest.get("versioned_dead", 0)) == 3
    current2 = current.where(F.col("vec_id") != 5).unionByName(v2)
    qv2 = [2.0 * x for x in qv]
    got2 = _ids_dists(search(ix, current2, qv2))
    assert got2[0] == (5, 0.0), f"{family}: second upsert not served"

    # reload keeps the whole versioned state
    re = load(spark, ix.path)
    assert re.count == n_total
    assert int(re.manifest.get("versioned_dead", 0)) == 3

    # plain delete + revive do not disturb versioned records: delete 7,
    # re-add it — 7 revives (BOTH its physical rows, the documented r13
    # duplicate-id caveat, hence +1), 5/11's version kills stay exact
    row7 = emb.where(F.col("vec_id") == 7).select("vec_id", "embedding")
    re = re.delete_batch([7])
    assert re.count == n_total - 1
    re = re.add_batch(row7)
    assert re.count == n_total + 1
    assert int(re.manifest.get("versioned_dead", 0)) == 3
    got3 = _ids_dists(search(re, current2, qv2))
    assert got3[0] == (5, 0.0)

    # compact physically reclaims all three dead versions, exactly
    # (7's two identical live rows both persist — the same caveat)
    re = re.compact()
    assert re.count == n_total + 1
    assert not re.manifest.get("versioned_tombstones")
    assert not int(re.manifest.get("deleted_count", 0))
    got4 = _ids_dists(search(re, current2, qv2))
    assert got4[0] == (5, 0.0)


def test_plain_delete_keeps_id_only_plan(spark, emb, tmp_path):
    """Plain deletes must NOT pay the epoch-aware join: the versioned
    flag stays unset and filter_dead keeps the r13 broadcast anti-join
    (no input_file_name/regexp in the plan)."""
    create = FAMILIES["pq"][0]
    ix = create(spark, emb, str(tmp_path / "plainpq"))
    ix = ix.delete_batch([3, 6, 9])
    assert not ix.manifest.get("versioned_tombstones")
    plan = ix._codes_df()._jdf.queryExecution().optimizedPlan().toString()
    assert "input_file_name" not in plan
    assert "LeftAnti" in plan


def test_versioned_scan_filters_by_file_epoch(spark, emb, tmp_path):
    """The epoch-aware DataFrame plan keeps rows whose file epoch is at
    or past the kill bound, drops the older ones."""
    create = FAMILIES["pq"][0]
    ix = create(spark, emb, str(tmp_path / "vpq"))
    n = emb.count()
    row5 = emb.where(F.col("vec_id") == 5).select("vec_id", "embedding")
    nxt = int(ix.manifest.get("append_epoch", 0)) + 1
    ix = ix.delete_batch([5], epoch_lt=nxt)
    ix = ix.add_batch(row5)  # identical vector, NEW epoch
    live = ix._codes_df()
    assert live.count() == n
    assert live.where(F.col("vec_id") == 5).count() == 1  # new row only
