"""Unit tests for BM25 keyword retrieval (pipeline/bm25.py)."""

from __future__ import annotations

import math

import pytest

from duckdb_vss_spark.pipeline.bm25 import bm25_scores


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark join window join"),
            (2, "window scan filter"),
            (3, "agg sort scan hash hash hash"),
            (4, "no query words here at all"),
        ],
        "doc_id long, text string",
    )


def _expected(docs, terms, k1=1.2, b=0.75, n_override=None, sumdl_override=None):
    toks = {i: t.split(" ") for i, t in docs}
    n = n_override if n_override is not None else len(toks)
    sumdl = (
        sumdl_override
        if sumdl_override is not None
        else sum(len(v) for v in toks.values())
    )
    avgdl = sumdl / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            part = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            s += round(part, 6)
        if s:
            out[i] = s
    return out


class TestBm25:
    def test_scores_match_reference_formula(self, corpus):
        rows = [(1, "spark join window join"), (2, "window scan filter"),
                (3, "agg sort scan hash hash hash"), (4, "no query words here at all")]
        terms = ["join", "window", "hash"]
        got = {
            r.doc_id: r.score
            for r in bm25_scores(corpus, "text", "doc_id", terms).collect()
        }
        want = _expected(rows, terms)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6)

    def test_only_matching_docs_returned(self, corpus):
        got = bm25_scores(corpus, "text", "doc_id", ["join"]).collect()
        assert [r.doc_id for r in got] == [1]

    def test_topk_ordering(self, corpus):
        got = bm25_scores(
            corpus, "text", "doc_id", ["join", "window", "hash"], topk=2
        ).collect()
        assert len(got) == 2
        assert got[0].score >= got[1].score

    def test_rare_term_outscores_common(self, spark):
        # 'rare' occurs in 1 of 10 docs, 'common' in 9 of 10 — same tf
        # and identical doc lengths, so idf decides.
        rows = [(i, "common pad") for i in range(9)] + [(9, "rare pad")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.score
            for r in bm25_scores(df, "text", "doc_id", ["rare", "common"]).collect()
        }
        assert got[9] > max(v for k, v in got.items() if k != 9)

    def test_validation(self, corpus):
        with pytest.raises(ValueError):
            bm25_scores(corpus, "text", "doc_id", [])
        with pytest.raises(ValueError):
            bm25_scores(corpus, "text", "doc_id", ["a", "a"])
        with pytest.raises(ValueError):
            bm25_scores(corpus, "text", "doc_id", ["a"], topk=0)

    def test_single_pass_and_degenerate_docs(self, spark, tmp_path):
        """r16: one tokenize pass per query — the materialized
        (id, dl, hits) proxy feeds tf, dfreq AND the corpus stats, so
        the built plan re-reads checkpoint blocks, never the source
        parquet; NULL-text and empty-text rows still count toward
        n_docs/avgdl exactly as before the rewrite."""
        rows = [
            (1, "spark join window join"),
            (2, "window scan filter"),
            (3, None),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.write.mode("overwrite").parquet(str(tmp_path / "docs"))
        docs = spark.read.parquet(str(tmp_path / "docs"))
        out = bm25_scores(docs, "text", "doc_id", ["join", "window"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Scan parquet" not in plan and "ExistingRDD" in plan
        got = {r.doc_id: r.score for r in out.collect()}
        # n_docs = 4 (NULL + empty text count; empty splits to [""],
        # one token) — pin against the reference formula with the same
        # length convention
        want = _expected(
            [(1, "spark join window join"), (2, "window scan filter"),
             (4, "")],
            ["join", "window"],
            n_override=4,
            sumdl_override=4 + 3 + 1,
        )
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], abs=2e-6)
