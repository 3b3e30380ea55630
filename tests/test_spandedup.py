"""Unit tests for exact-substring span dedup (pipeline/spandedup.py)."""

from __future__ import annotations

import pytest

from duckdb_vss_spark.pipeline.spandedup import duplicate_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _spans(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_tokens) for r in df.collect()
    )


class TestDuplicateSpans:
    def test_shared_span_located_in_both_docs(self, spark):
        shared = " ".join(f"s{i}" for i in range(6))
        a = "a1 a2 " + shared + " a3"
        b = "b1 " + shared + " b2 b3 b4"
        df = _docs(spark, [a, b])
        got = _spans(duplicate_spans(df, "text", "doc_id", width=6))
        # shared run is 6 tokens: one 6-gram at offset 2 in doc0, 1 in doc1
        assert got == [(0, 2, 6), (1, 1, 6)]

    def test_longer_shared_run_merges_to_maximal_span(self, spark):
        shared = " ".join(f"s{i}" for i in range(9))  # 9 tokens, width 6
        df = _docs(spark, [shared + " x", "y " + shared])
        got = _spans(duplicate_spans(df, "text", "doc_id", width=6))
        # 4 consecutive 6-grams merge into one 9-token span per doc
        assert got == [(0, 0, 9), (1, 1, 9)]

    def test_no_cross_doc_repeat_no_spans(self, spark):
        df = _docs(spark, ["a b c d e f g", "h i j k l m n"])
        assert duplicate_spans(df, "text", "doc_id", width=4).count() == 0

    def test_short_docs_ignored(self, spark):
        df = _docs(spark, ["a b", "a b"])
        assert duplicate_spans(df, "text", "doc_id", width=4).count() == 0

    def test_min_docs_threshold(self, spark):
        shared = " ".join(f"t{i}" for i in range(5))
        df = _docs(spark, [shared, shared, shared + " z"])
        assert duplicate_spans(df, "text", "doc_id", width=5, min_docs=3).count() == 3
        assert (
            duplicate_spans(df, "text", "doc_id", width=5, min_docs=4).count() == 0
        )

    def test_validation(self, spark):
        df = _docs(spark, ["a b c"])
        with pytest.raises(ValueError):
            duplicate_spans(df, "text", "doc_id", width=0)
        with pytest.raises(ValueError):
            duplicate_spans(df, "text", "doc_id", min_docs=1)
