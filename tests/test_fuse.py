"""Unit tests for reciprocal-rank fusion (operators/fuse.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.operators.fuse import add_rank, rrf_fuse


def _list(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


class TestRrfFuse:
    def test_doc_in_both_lists_beats_single_list_winners(self, spark):
        a = _list(spark, [(1, 1), (2, 2), (3, 3)])
        b = _list(spark, [(3, 1), (4, 2)])
        out = rrf_fuse([a, b], "doc_id").collect()
        # doc 3: 1/63 + 1/61 > doc 1: 1/61 alone
        assert out[0].doc_id == 3
        got = {r.doc_id: r.rrf_score for r in out}
        assert got[3] == pytest.approx(1 / 63 + 1 / 61, abs=1e-9)
        assert got[1] == pytest.approx(1 / 61, abs=1e-9)

    def test_ties_break_by_id(self, spark):
        a = _list(spark, [(7, 1), (5, 2)])
        b = _list(spark, [(5, 1), (7, 2)])
        out = rrf_fuse([a, b], "doc_id").collect()
        assert [r.doc_id for r in out] == [5, 7]

    def test_topk_limits(self, spark):
        a = _list(spark, [(i, i) for i in range(1, 20)])
        assert rrf_fuse([a], "doc_id", topk=5).count() == 5

    def test_add_rank_is_one_based_and_ordered(self, spark):
        df = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9)], "doc_id long, score double"
        )
        out = add_rank(df, "doc_id", F.desc("score"), F.asc("doc_id")).collect()
        got = {r.doc_id: r.rank for r in out}
        assert got == {2: 1, 3: 2, 1: 3}

    def test_validation(self, spark):
        a = _list(spark, [(1, 1)])
        with pytest.raises(ValueError):
            rrf_fuse([], "doc_id")
        with pytest.raises(ValueError):
            rrf_fuse([a], "doc_id", k=0)
        with pytest.raises(ValueError):
            rrf_fuse([a.drop("rank")], "doc_id")
