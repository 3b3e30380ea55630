"""Unit tests for token-budget data mixing (pipeline/mix.py)."""

from __future__ import annotations

import pytest

from duckdb_vss_spark.pipeline.mix import mix_by_token_budget


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestMixByTokenBudget:
    def test_budget_never_overshoots(self, spark):
        rows = [(i, "a", "w " * 9 + "w") for i in range(20)]  # 10 tokens each
        df = _docs(spark, rows)
        kept = mix_by_token_budget(
            df, "text", "doc_id", "source", budgets={"a": 35}
        )
        got = kept.collect()
        # 10-token docs against a 35 budget: exactly 3 docs, 30 tokens
        assert len(got) == 3
        assert sum(r.n_tok for r in got) == 30
        assert max(r.cum_tok for r in got) <= 35

    def test_monotone_in_budget(self, spark):
        rows = [(i, "a", "x " * (i % 5 + 1)) for i in range(50)]
        df = _docs(spark, rows)
        k1 = {r.doc_id for r in mix_by_token_budget(df, "text", "doc_id", "source", {"a": 40}).collect()}
        k2 = {r.doc_id for r in mix_by_token_budget(df, "text", "doc_id", "source", {"a": 90}).collect()}
        assert k1 <= k2 and len(k2) > len(k1)

    def test_default_budget_and_zero_excludes(self, spark):
        rows = [(1, "a", "one two"), (2, "b", "three four")]
        df = _docs(spark, rows)
        kept = mix_by_token_budget(
            df, "text", "doc_id", "source", budgets={"a": 100}, default_budget=0
        )
        assert [r.doc_id for r in kept.collect()] == [1]

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"s{i % 2}", "t " * (i % 7 + 1)) for i in range(60)]
        df = _docs(spark, rows)
        a = sorted(r.doc_id for r in mix_by_token_budget(df, "text", "doc_id", "source", {"s0": 50, "s1": 50}).collect())
        b = sorted(
            r.doc_id
            for r in mix_by_token_budget(
                df.repartition(13), "text", "doc_id", "source", {"s0": 50, "s1": 50}
            ).collect()
        )
        assert a == b

    def test_validation(self, spark):
        df = _docs(spark, [(1, "a", "x")])
        with pytest.raises(ValueError):
            mix_by_token_budget(df, "text", "doc_id", "source", {"a": -1})
        with pytest.raises(ValueError):
            mix_by_token_budget(df, "text", "doc_id", "source", {}, default_budget=-5)
