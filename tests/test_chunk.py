"""Unit tests for document chunking (pipeline/chunk.py) and per-source
caps (pipeline/sample.source_cap)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.chunk import chunk_documents
from duckdb_vss_spark.pipeline.sample import source_cap


def _chunks(spark, text, chunk_tokens, overlap):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", chunk_tokens, overlap)
    return [
        (r.chunk_id, r.n_tokens, r.chunk_text)
        for r in out.orderBy("chunk_id").collect()
    ]


class TestChunkDocuments:
    def test_exact_multiple_no_overlap(self, spark):
        text = " ".join(f"t{i}" for i in range(6))
        assert _chunks(spark, text, 3, 0) == [
            (0, 3, "t0 t1 t2"),
            (1, 3, "t3 t4 t5"),
        ]

    def test_overlap_windows(self, spark):
        text = " ".join(f"t{i}" for i in range(10))
        # chunk=8 overlap=4 -> step 4, last start = ceil((10-8)/4)=1
        got = _chunks(spark, text, 8, 4)
        assert got == [
            (0, 8, " ".join(f"t{i}" for i in range(8))),
            (1, 6, " ".join(f"t{i}" for i in range(4, 10))),
        ]

    def test_short_doc_single_chunk(self, spark):
        assert _chunks(spark, "a b", 32, 8) == [(0, 2, "a b")]

    def test_tail_always_covered_no_redundant_chunk(self, spark):
        text = " ".join(f"t{i}" for i in range(9))
        got = _chunks(spark, text, 4, 2)
        # starts 0,2,4 (ceil(5/2)=3) -> wait: ceil((9-4)/2)=3 -> 0,2,4,6
        assert [c for c, _, _ in got] == [0, 1, 2, 3]
        # last chunk reaches the final token
        assert got[-1][2].endswith("t8")
        # every token appears in some chunk
        seen = set()
        for _, _, t in got:
            seen.update(t.split(" "))
        assert seen == {f"t{i}" for i in range(9)}

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "doc_id", 0)
        with pytest.raises(ValueError):
            chunk_documents(df, "text", "doc_id", 4, overlap=4)


class TestSourceCap:
    def test_cap_and_determinism(self, spark):
        rows = [(i, f"s{i % 3}") for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        kept = source_cap(df, "doc_id", "source", cap=5, seed=1)
        counts = {
            r.source: r.n
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"s0": 5, "s1": 5, "s2": 5}
        # deterministic across repartitionings
        a = sorted(r.doc_id for r in kept.collect())
        b = sorted(
            r.doc_id
            for r in source_cap(
                df.repartition(7), "doc_id", "source", cap=5, seed=1
            ).collect()
        )
        assert a == b

    def test_nested_caps(self, spark):
        rows = [(i, "s") for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        k3 = {r.doc_id for r in source_cap(df, "doc_id", "source", 3).collect()}
        k10 = {r.doc_id for r in source_cap(df, "doc_id", "source", 10).collect()}
        assert k3 < k10

    def test_small_group_kept_whole(self, spark):
        df = spark.createDataFrame([(1, "s"), (2, "s")], "doc_id long, source string")
        assert source_cap(df, "doc_id", "source", 10).count() == 2

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
        with pytest.raises(ValueError):
            source_cap(df, "doc_id", "source", 0)
