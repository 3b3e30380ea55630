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


class TestTemperatureMix:
    def test_alpha_one_is_proportional(self, spark):
        from duckdb_vss_spark.pipeline.mix import temperature_budgets

        df = spark.createDataFrame(
            [(i, "a" if i < 30 else "b", "x " * 10) for i in range(40)],
            "doc_id long, source string, text string",
        )
        # a: 30 docs * 10 tok = 300; b: 10 * 10 = 100 → 3:1 split
        b = temperature_budgets(df, "text", "source", 4000, alpha=1.0)
        assert b == {"a": 3000, "b": 1000}

    def test_alpha_half_upweights_small_sources(self, spark):
        from duckdb_vss_spark.pipeline.mix import temperature_budgets

        df = spark.createDataFrame(
            [(i, "big" if i < 90 else "small", "x " * 10) for i in range(100)],
            "doc_id long, source string, text string",
        )
        b = temperature_budgets(df, "text", "source", 1000, alpha=0.5)
        # proportional would give small 100; sqrt weighting gives it more
        assert b["small"] > 100
        assert b["big"] + b["small"] <= 1000  # floor split never overshoots

    def test_budget_derivation_is_exact_integer_math(self, spark):
        import math

        from duckdb_vss_spark.pipeline.mix import temperature_budgets

        df = spark.createDataFrame(
            [(i, f"s{i % 7}", "tok " * (i % 13 + 1)) for i in range(200)],
            "doc_id long, source string, text string",
        )
        got = temperature_budgets(df, "text", "source", 12345, alpha=0.5)
        # recompute independently from the raw token counts
        from pyspark.sql import functions as F

        from duckdb_vss_spark.pipeline.text import token_count
        counts = {
            r["source"]: r["n"]
            for r in df.groupBy("source").agg(F.sum(token_count("text")).alias("n")).collect()
        }
        ws = {g: int(math.sqrt(float(n)) * (1 << 20)) for g, n in counts.items()}
        tw = sum(ws.values())
        want = {g: 12345 * w // tw for g, w in ws.items()}
        assert got == want

    def test_invalid_alpha_rejected(self, spark):
        import pytest

        from duckdb_vss_spark.pipeline.mix import temperature_budgets

        df = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
        with pytest.raises(ValueError, match="alpha"):
            temperature_budgets(df, "text", "source", 100, alpha=0.7)

    def test_temperature_mix_monotone_in_total(self, spark):
        from duckdb_vss_spark.pipeline.mix import temperature_mix

        df = spark.createDataFrame(
            [(i, f"s{i % 3}", "w " * (i % 9 + 1)) for i in range(60)],
            "doc_id long, source string, text string",
        )
        small = {r["doc_id"] for r in temperature_mix(df, "text", "doc_id", "source", 100, seed=5).collect()}
        big = {r["doc_id"] for r in temperature_mix(df, "text", "doc_id", "source", 300, seed=5).collect()}
        assert small <= big  # raising the total only ADDS docs
