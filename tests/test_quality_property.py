"""Hypothesis cross-checks for the in-row curation folds
(pipeline/quality.py): the Spark `aggregate`-fold statistics must agree
with straightforward pure-Python references on arbitrary token lists.

One Spark job evaluates ALL drawn examples at once (hypothesis drives
the data generation up front; per-example Spark jobs would be minutes).
"""

from collections import Counter

from hypothesis import given, settings, strategies as st

from duckdb_vss_spark.pipeline.quality import (
    duplicate_token_fraction,
    max_ngram_freq,
    max_token_run,
    mean_word_length,
)

_token = st.text(alphabet="abcxyz", min_size=1, max_size=4)
_doc = st.lists(_token, min_size=0, max_size=30).map(" ".join)


def _py_max_run(toks):
    best = run = 0
    prev = None
    for t in toks:
        run = run + 1 if t == prev else 1
        best = max(best, run)
        prev = t
    return best


def _py_max_bigram_freq(toks):
    grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    return max(Counter(grams).values()) if grams else 0


@settings(max_examples=30, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_folds_match_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            max_token_run("text").alias("mr"),
            max_ngram_freq("text", 2).alias("mg"),
            duplicate_token_fraction("text").alias("df_"),
            mean_word_length("text").alias("mw"),
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")  # Spark split semantics: "" -> [""]
        r = got[i]
        assert r["mr"] == _py_max_run(toks)
        assert r["mg"] == _py_max_bigram_freq(toks)
        assert abs(r["df_"] - (1 - len(set(toks)) / max(len(toks), 1))) < 1e-12
        assert abs(r["mw"] - sum(map(len, toks)) / max(len(toks), 1)) < 1e-12
