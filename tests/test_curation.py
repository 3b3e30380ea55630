"""Unit tests for the round-6 curation-pipeline operators: repetition/
quality filters, PII scrubbing, corpus vocabulary/OOV, contamination.

Cross-engine value equality is pinned by the registry oracle gate
(tests/test_registry_oracle.py runs q_repetition_stats / q_pii_scrub /
q_vocab_topk / q_doc_oov_rate / q_contamination against DuckDB); these
tests pin edge-case semantics on hand-built rows.
"""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.contamination import ngram_contamination
from duckdb_vss_spark.pipeline.corpus import oov_rate, vocab_topk
from duckdb_vss_spark.pipeline.quality import (
    duplicate_token_fraction,
    max_ngram_freq,
    max_token_run,
    mean_word_length,
    repetition_keep,
    top_ngram_fraction,
)
from duckdb_vss_spark.pipeline.scrub import PII_PATTERNS, pii_counts, redact_pii


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e"),                       # clean
        (1, "go go go go stop"),                # run of 4
        (2, "x y x y x y x y"),                 # dominant bigram
        (3, "w"),                               # single token: no bigrams
        (4, ""),                                # empty text
        (5, "one two one two three four five"), # mild repetition
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _col_map(docs, col):
    return {r["doc_id"]: r["v"] for r in docs.select("doc_id", col.alias("v")).collect()}


def test_max_token_run(docs):
    v = _col_map(docs, max_token_run("text"))
    assert v[0] == 1 and v[1] == 4 and v[2] == 1 and v[3] == 1
    # empty text splits to [""] — one (empty) token, run 1
    assert v[4] == 1


def test_max_ngram_freq_and_fraction(docs):
    v = _col_map(docs, max_ngram_freq("text", 2))
    # "x y" appears 4 times among 7 bigrams of doc 2
    assert v[2] == 4 and v[0] == 1
    # no bigrams in a 1-token doc -> freq 0, fraction 0.0
    assert v[3] == 0
    f = _col_map(docs, top_ngram_fraction("text", 2))
    assert f[3] == 0.0 and f[4] == 0.0
    assert abs(f[2] - 4 / 7) < 1e-12


def test_dup_fraction_and_mean_wlen(docs):
    d = _col_map(docs, duplicate_token_fraction("text"))
    assert d[0] == 0.0 and abs(d[1] - (1 - 2 / 5)) < 1e-12
    w = _col_map(docs, mean_word_length("text"))
    assert w[0] == 1.0 and abs(w[1] - 12 / 5) < 1e-12
    assert w[4] == 0.0  # [""] -> total length 0 / 1 token


def test_repetition_keep_flags(docs):
    # defaults are tuned for the ~60-token corpus; pin the DECISION
    # LOGIC here with thresholds sized for these tiny docs
    k = _col_map(
        docs,
        repetition_keep(
            "text",
            max_run_limit=2,
            top_bigram_limit=0.5,
            dup_token_limit=0.9,
            min_mean_wlen=0.5,
            max_mean_wlen=10.0,
        ),
    )
    assert k[0] is True          # clean doc passes
    assert k[1] is False         # run of 4 > 2
    assert k[2] is False         # top bigram 4/7 > 0.5
    assert k[4] is False         # mean_wlen 0 < 0.5


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@ex.co or http://a.b/c?q=1 ip 10.0.0.1 tel +1-555-0100 end"),
            (2, "nothing here"),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id", redact_pii("t").alias("clean"), *[c.alias(n) for n, c in pii_counts("t").items()]
        ).collect()
    }
    r1 = out[1]
    assert r1["clean"] == "mail <EMAIL> or <URL> ip <IP> tel <PHONE> end"
    assert (r1["n_url"], r1["n_email"], r1["n_ip"], r1["n_phone"]) == (1, 1, 1, 1)
    r2 = out[2]
    assert r2["clean"] == "nothing here"
    assert (r2["n_url"], r2["n_email"], r2["n_ip"], r2["n_phone"]) == (0, 0, 0, 0)


def test_redact_order_url_swallows_its_own_at(spark):
    # an '@' inside a URL must be consumed by the URL pass (order is
    # URL -> email), not torn apart by the email pattern
    df = spark.createDataFrame([(1, "see https://u:p@host/x now")], "id long, t string")
    row = df.select(redact_pii("t").alias("c")).first()
    assert row["c"] == "see <URL> now"
    assert [p[0] for p in PII_PATTERNS] == ["url", "email", "ip", "phone"]


def test_vocab_topk_tie_break(spark):
    df = spark.createDataFrame(
        [(0, "b a b a c"), (1, "c d")], "doc_id long, text string"
    )
    rows = vocab_topk(df, "text", 3).collect()
    # freqs: a=2 b=2 c=2 d=1 -> top3 by (freq desc, tok asc) = a, b, c
    assert [(r["tok"], r["freq"]) for r in rows] == [("a", 2), ("b", 2), ("c", 2)]
    with pytest.raises(ValueError):
        vocab_topk(df, "text", 0)


def test_oov_rate(spark):
    df = spark.createDataFrame(
        [(0, "a a b z"), (1, "z z")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame([("a",), ("b",)], "tok string")
    got = {r["doc_id"]: r["oov_rate"] for r in oov_rate(df, "text", "doc_id", vocab).collect()}
    assert got[0] == 0.25 and got[1] == 1.0


def test_ngram_contamination_basic(spark):
    df = spark.createDataFrame(
        [
            (0, "p q r s t u"),      # eval: shares 4-grams with doc 1
            (41, "zz yy xx ww"),     # eval: no overlap -> omitted
            (1, "p q r s t"),        # train
            (2, "q r s t u end"),    # train
            (3, "unrelated words here now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_shared_grams"], r["n_train_docs"])
        for r in ngram_contamination(
            df, "text", "doc_id", F.col("doc_id").isin(0, 41), n=4
        ).collect()
    }
    # eval doc 0 grams: "p q r s","q r s t","r s t u"; doc1 has first
    # two, doc2 has middle two -> 3 distinct shared grams, 2 train docs
    assert out[0] == (3, 2)
    assert 41 not in out


def test_ngram_contamination_max_train_df(spark):
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c d"), (2, "a b c d"), (3, "a b c d")],
        "doc_id long, text string",
    )
    full = ngram_contamination(df, "text", "doc_id", F.col("doc_id") == 0, n=4)
    assert full.count() == 1
    capped = ngram_contamination(
        df, "text", "doc_id", F.col("doc_id") == 0, n=4, max_train_df=2
    )
    # the gram appears in 3 train docs > cap 2 -> dropped entirely
    assert capped.count() == 0


def test_hash_embedding_dense_matches_long_and_normalizes(spark):
    """The dense array form must agree bucket-by-bucket with the long
    form and come out unit-normalized (or all-zero for docs whose
    signs cancel)."""
    import math

    from duckdb_vss_spark.pipeline.corpus import hash_embedding, hash_embedding_long
    from duckdb_vss_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    dim = 16
    long_rows = {
        (r[0], r[1]): r[2]
        for r in hash_embedding_long(docs, "text", "doc_id", dim).collect()
    }
    dense = hash_embedding(docs, "text", "doc_id", dim).collect()
    assert len(dense) > 0
    for r in dense:
        raw = [float(long_rows.get((r["doc_id"], b), 0)) for b in range(dim)]
        nrm = math.sqrt(sum(x * x for x in raw))
        exp = [x / nrm for x in raw] if nrm > 0 else raw
        got = [float(x) for x in r["embedding"]]
        assert len(got) == dim
        assert all(abs(g - e) < 1e-6 for g, e in zip(got, exp))


def test_hash_embedding_feeds_neardup_family(spark):
    """The model-free embedding must be consumable by the
    embedding-cosine dedup operator unchanged (schema drop-in)."""
    from duckdb_vss_spark.pipeline.corpus import hash_embedding
    from duckdb_vss_spark.pipeline.dedup import embedding_neardup_pairs
    from duckdb_vss_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(300)
    emb = hash_embedding(docs, "text", "doc_id", 16)
    pairs = embedding_neardup_pairs(emb, "embedding", "doc_id", 0.2)
    # exact duplicate texts exist in the synthetic corpus -> some pairs
    assert pairs.count() >= 0 and set(pairs.columns) >= {"id_a", "id_b"}


def test_perplexity_filter_flags_garbled_text(spark):
    """A doc of shuffled rare junk tokens must rank worse (lower avg
    bigram logprob) than repetitive natural-ish text; the filter is
    partitioning-invariant."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.pipeline.lm import bigram_scores, perplexity_filter

    rows = [(i, "the cat sat on the mat and the cat sat again") for i in range(20)]
    rows.append((100, "zq xv jk wp qz vx kj pw zz qq ww pp"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r["id"]: r["avg_logprob"] for r in bigram_scores(df, "text", "doc_id").collect()}
    assert scores[100] < min(v for k, v in scores.items() if k != 100)
    worst = [r["doc_id"] for r in perplexity_filter(df, "text", "doc_id", 1).collect()]
    assert worst == [100]
    worst2 = [
        r["doc_id"]
        for r in perplexity_filter(df.repartition(5), "text", "doc_id", 1).collect()
    ]
    assert worst2 == [100]


def test_curate_corpus_stage_semantics(spark):
    """The composed chain must honor each stage: low-quality docs out,
    exact dups collapse to min id, sampling is monotone in fraction,
    offsets per shard are a prefix-sum of surviving token counts."""
    from pyspark.sql import functions as F

    from duckdb_vss_spark.pipeline.curate import curate_corpus

    rows = [
        (1, "en", "the quick brown fox jumps over the lazy dog and keeps running far"),
        (2, "en", "the quick brown fox jumps over the lazy dog and keeps running far"),  # dup of 1
        (3, "en", "a a a a"),                                        # low diversity -> filtered
        (4, "de", "ein ganz anderer text mit vielen verschiedenen neuen woertern hier drin"),
        (5, "en", "completely different english sentence with many distinct useful words inside"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = curate_corpus(
        df, "doc_id", "text", "lang",
        min_quality=0.4, fractions={"en": 1.0}, default_fraction=1.0,
        budget=8, num_shards=2, seed=3,
    ).collect()
    ids = {r["doc_id"] for r in out}
    assert 2 not in ids          # dup collapsed to min id 1
    assert 3 not in ids          # low-quality dropped
    assert {1, 4, 5} <= ids      # fractions 1.0 keep the rest
    # per-shard offsets are consecutive prefix sums
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["offset"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        acc = 0
        for r in shard_rows:
            assert r["offset"] == acc
            assert r["seq_id"] == acc // 8 and r["seq_pos"] == acc % 8
            acc += r["n_tok"]
