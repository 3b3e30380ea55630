"""End-to-end composition test: the RAG ingestion path.

chunk_documents → deterministic embedding (Arrow-batched mapInPandas,
the plumbing a real encoder plugs into) → IVF index build → self-
retrieval. Proves the curation, embedding and ANN layers compose
without repartition glue and that a chunk retrieves itself at top-1
(exact-probe sanity: with full nprobe the IVF search is exact)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.chunk import chunk_documents
from duckdb_vss_spark.sources import load_table

SF = "/root/testdata/sf0.001"
DIM = 32


def _make_embed_batch():
    """Deterministic bag-of-words hash embedding (stands in for a real
    encoder; batch of strings → [n, DIM] float32). Returned as a
    CLOSURE so cloudpickle ships it by value — module-level functions
    in tests/ are pickled by reference to a module Python workers
    cannot import."""
    dim = DIM

    def embed_batch(texts):
        import hashlib as _hl

        import numpy as _np

        out = _np.zeros((len(texts), dim), dtype=_np.float32)
        for i, t in enumerate(texts):
            for tok in t.split(" "):
                h = int.from_bytes(_hl.md5(tok.encode()).digest()[:8], "big")
                out[i, h % dim] += 1.0 if (h >> 8) % 2 else -1.0
        norms = _np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return out / norms

    return embed_batch


_embed_batch = _make_embed_batch()


def _embed(df, text_col):
    import pandas as pd

    fn = _make_embed_batch()

    def gen(batches):
        for pdf in batches:
            mat = fn(pdf[text_col].tolist())
            yield pd.DataFrame(
                {
                    "chunk_uid": pdf["chunk_uid"],
                    "embedding": [row.tolist() for row in mat],
                }
            )

    return df.mapInPandas(gen, "chunk_uid long, embedding array<float>")


@pytest.fixture(scope="module")
def chunk_index(spark, tmp_path_factory):
    from duckdb_vss_spark.index import create_ivf_index

    docs = load_table(spark, SF, "documents")
    chunks = chunk_documents(docs, "text", "doc_id", chunk_tokens=16, overlap=4)
    chunks = chunks.withColumn(
        "chunk_uid", F.col("doc_id") * 1000 + F.col("chunk_id")
    ).cache()
    emb = _embed(chunks.select("chunk_uid", "chunk_text"), "chunk_text")
    path = str(tmp_path_factory.mktemp("ragidx") / "ivf")
    idx = create_ivf_index(
        spark, emb, "embedding", "chunk_uid", path, nlist=4, overwrite=True
    )
    return chunks, idx


class TestRagCompose:
    def test_chunks_flow_into_index(self, spark, chunk_index):
        chunks, idx = chunk_index
        assert idx.manifest["count"] == chunks.count() > 0

    def test_chunk_retrieves_itself_top1(self, spark, chunk_index):
        chunks, idx = chunk_index
        sample = chunks.orderBy("doc_id", "chunk_id").limit(3).collect()
        for row in sample:
            qv = _embed_batch([row.chunk_text])[0].tolist()
            hits = idx.knn_search(qv, 1, nprobe=idx.nlist).collect()
            got_text = dict(
                (r.chunk_uid, r.chunk_text)
                for r in chunks.where(
                    F.col("chunk_uid") == hits[0]["chunk_uid"]
                ).collect()
            )
            # top-1 is the chunk itself, or an exact-duplicate chunk
            # (the corpus contains duplicated documents by design)
            assert hits[0]["chunk_uid"] == row.chunk_uid or (
                got_text[hits[0]["chunk_uid"]] == row.chunk_text
            )
