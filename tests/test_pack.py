"""Sequence-packing tests (pipeline/pack.py)."""

import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.pack import pack_sequences


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(["w"] * (5 + i % 7))) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_offsets_are_exact_prefix_sums(docs):
    out = pack_sequences(docs, "doc_id", "text", budget=16, num_shards=4, seed=3)
    rows = sorted(
        out.select("shard", "pos", "doc_id", "n_tok", "offset", "seq_id", "seq_pos").collect(),
        key=lambda r: (r["shard"], r["pos"], r["doc_id"]),
    )
    run = {}
    for r in rows:
        expect = run.get(r["shard"], 0)
        assert r["offset"] == expect
        assert r["seq_id"] == expect // 16
        assert r["seq_pos"] == expect % 16
        run[r["shard"]] = expect + r["n_tok"]


def test_packing_is_partitioning_invariant(docs):
    a = pack_sequences(docs, "doc_id", "text", budget=16, num_shards=4, seed=3)
    b = pack_sequences(
        docs.repartition(7), "doc_id", "text", budget=16, num_shards=4, seed=3
    )
    ra = {(r["doc_id"], r["shard"], r["offset"], r["seq_id"]) for r in a.collect()}
    rb = {(r["doc_id"], r["shard"], r["offset"], r["seq_id"]) for r in b.collect()}
    assert ra == rb


def test_no_token_gaps_within_shard(docs):
    """Concat-then-chunk wastes zero tokens: each shard's offsets tile
    the stream exactly (next offset = prev offset + prev n_tok)."""
    out = pack_sequences(docs, "doc_id", "text", budget=32, num_shards=2, seed=1)
    for shard in (0, 1):
        rows = sorted(
            out.where(F.col("shard") == shard).collect(), key=lambda r: r["offset"]
        )
        total = sum(r["n_tok"] for r in rows)
        assert rows[-1]["offset"] + rows[-1]["n_tok"] == total


def test_budget_validation(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, "doc_id", "text", budget=0)
