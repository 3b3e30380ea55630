"""Corpus-level statistics for training-data curation.

Two ops every tokenizer/data-mix pipeline runs before training:

- **vocab_topk** — corpus vocabulary by frequency (the seed of any
  frequency-based tokenizer / coverage analysis). One partial-agg
  shuffle keyed by token (map-side combine collapses each partition to
  its local vocab first, so the exchange carries ~|vocab| rows per
  partition, not ~|tokens|), then a global top-k via
  TakeOrderedAndProject — no global sort of the full vocabulary.

- **oov_rate** — per-document out-of-vocabulary fraction against a
  reference vocabulary. The vocabulary is broadcast (it is top-k small
  by construction); the per-doc rate is a map-side join + one
  aggregation keyed by doc id. At 100 TB this is one scan + one
  skinny-keyed shuffle of (doc_id, two counters).

Ties in vocab_topk break by (freq DESC, token ASC) — fully
deterministic, and reproduced verbatim by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.text import tokens

__all__ = ["vocab_topk", "oov_rate", "corpus_diff", "random_projection", "random_projection_signs"]


def vocab_topk(docs: DataFrame, text_col: str, k: int) -> DataFrame:
    """Top-k corpus tokens by frequency: (tok, freq), freq DESC, tok ASC."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = docs.select(F.explode(tokens(text_col)).alias("tok"))
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .orderBy(F.desc("freq"), "tok")
        .limit(k)
    )


def oov_rate(
    docs: DataFrame, text_col: str, id_col: str, vocab: DataFrame
) -> DataFrame:
    """Per-document OOV fraction vs ``vocab`` (a DataFrame with a
    ``tok`` column, e.g. ``vocab_topk``'s output). Returns
    (id_col, oov_rate). The rate is an exact integer ratio evaluated in
    one IEEE division — bit-reproducible across engines."""
    toks = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    hit = F.broadcast(vocab.select("tok").distinct().withColumn("inv", F.lit(True)))
    j = toks.join(hit, "tok", "left")
    return j.groupBy(id_col).agg(
        (
            F.sum(F.when(F.col("inv").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("oov_rate")
    )


def hash_embedding_long(
    docs: DataFrame, text_col: str, id_col: str, dim: int = 16
) -> DataFrame:
    """Feature-hashed ("hashing trick") text embedding, long form:
    (doc, bucket, signed token count). The model-free embedding every
    curation stack can afford at 100 TB — tokens hash to one of ``dim``
    buckets with a ±1 sign, so a document's vector is one group-by away
    and needs no vocabulary, no model, no driver state (Weinberger et
    al. 2009, feature hashing).

    Cross-engine exact: bucket and sign derive from md5 hex characters
    via ``ascii(substr(...))`` arithmetic — md5, substr, and ascii
    agree bit-for-bit between Spark and DuckDB, so the oracle is plain
    SQL and the values are integers (no float accumulation at all).

    Plan shape: explode → map-side bucket/sign math → ONE partial→final
    aggregation keyed (doc, bucket). The exchange carries at most
    docs·dim rows regardless of token count. The dense-array form
    (``hash_embedding``) is a second map-only pass over this output."""
    tok = F.explode(F.split(F.col(text_col), " ")).alias("tok")
    toks = docs.select(F.col(id_col), tok).where(F.col("tok") != "")
    h = F.md5(F.col("tok"))
    bucket = (
        F.ascii(F.substring(h, 1, 1)) * 16 + F.ascii(F.substring(h, 2, 1))
    ) % dim
    sign = F.when(F.ascii(F.substring(h, 3, 1)) % 2 == 0, F.lit(1)).otherwise(
        F.lit(-1)
    )
    return (
        toks.select(F.col(id_col), bucket.alias("bucket"), sign.alias("sign"))
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").cast("bigint").alias("val"))
    )


def hash_embedding(
    docs: DataFrame, text_col: str, id_col: str, dim: int = 16
) -> DataFrame:
    """Dense-array form of ``hash_embedding_long``: (doc, float array
    of ``dim``), zero-filled, unit-normalized — drop-in for the
    embedding-cosine dedup family (embedding_neardup_pairs, semdedup)
    when no model embeddings exist. Sort-slice packs the array without
    a window; empty docs get no row (no tokens → no vector)."""
    long = hash_embedding_long(docs, text_col, id_col, dim)
    packed = (
        long.groupBy(id_col)
        .agg(
            F.map_from_arrays(
                F.collect_list("bucket"), F.collect_list("val")
            ).alias("__m")
        )
        .select(
            F.col(id_col),
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("__m"), i), F.lit(0)
                ).cast("double"),
            ).alias("__raw"),
        )
    )
    norm = F.sqrt(
        F.aggregate(
            F.col("__raw"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return packed.select(
        F.col(id_col),
        F.when(
            norm > 0,
            F.transform(F.col("__raw"), lambda x: (x / norm).cast("float")),
        )
        .otherwise(F.transform(F.col("__raw"), lambda x: x.cast("float")))
        .alias("embedding"),
    )


def corpus_diff(
    old: DataFrame, new: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Snapshot diff between two corpus versions by content
    fingerprint: (id, status) with status ∈ {added, removed, changed}.
    Unchanged documents are omitted — at 100 TB they are the bulk, and
    the diff is what drives incremental processing (re-embed / re-dedup
    / re-index only the delta).

    Each side reduces to (id, fingerprint) before the full outer join,
    so the shuffle carries two skinny columns and payloads never move;
    the fingerprint is the same md5-of-normalized-text the exact-dedup
    family uses, so any engine reproduces the status labels exactly."""
    from duckdb_vss_spark.pipeline.text import fingerprint

    o = old.select(
        F.col(id_col).alias("id"),
        fingerprint(text_col).alias("__fo"),
        F.lit(True).alias("__po"),
    )
    n = new.select(
        F.col(id_col).alias("id"),
        fingerprint(text_col).alias("__fn"),
        F.lit(True).alias("__pn"),
    )
    j = o.join(n, "id", "full_outer")
    # Presence flags distinguish "row missing on a side" from "row
    # present with a NULL text" — fingerprint(NULL) is NULL, so keying
    # the status off the fingerprints alone would mislabel an id that
    # exists in both snapshots with NULL text as added (ADVICE r7).
    # The fingerprint comparison itself is null-safe for the same
    # reason: NULL text ↔ NULL text is "unchanged", not "changed".
    return (
        j.withColumn(
            "status",
            F.when(F.col("__po").isNull(), F.lit("added"))
            .when(F.col("__pn").isNull(), F.lit("removed"))
            .when(~F.col("__fo").eqNullSafe(F.col("__fn")), F.lit("changed")),
        )
        .where(F.col("status").isNotNull())
        .select("id", "status")
    )


def random_projection_signs(in_dim: int, out_dim: int, seed: int = 42):
    """The deterministic ±1 sign matrix shared by both engines: sign
    s(i, j) = +1 iff the first md5 hex nibble of 'rp_<seed>_<i>_<j>'
    is even. A pure function of (seed, i, j), so SQL rebuilds the
    identical matrix from scratch — no fitted state to ship (unlike
    PCA, whose eigendecomposition has no SQL replay)."""
    import hashlib

    import numpy as np

    md5 = hashlib.md5
    s = np.empty((in_dim, out_dim), dtype=np.float64)
    for i in range(in_dim):
        for j in range(out_dim):
            nib = md5(f"rp_{seed}_{i}_{j}".encode()).hexdigest()[0]
            s[i, j] = 1.0 if int(nib, 16) % 2 == 0 else -1.0
    return s


def random_projection(
    df: DataFrame, vec_col: str, out_dim: int, seed: int = 42,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: ``out_col`` =
    array<double> of ``out_dim`` with out[j] = <v, s_j> / sqrt(out_dim)
    over the seeded ±1 sign matrix — the model-free dimensionality
    reduction that preserves pairwise distances in expectation
    (Achlioptas 2003 sign-matrix variant; FAISS ships the same idea as
    a pretransform). Map-only, no shuffle, no fitted state; the sign
    columns ride as one constant-folded literal and each output
    coordinate is the pinned sequential-fold inner product, so any
    engine reproduces the projected vectors bit-for-bit.

    At 100 TB this is the scan-width lever before ANN indexing:
    1024-dim float32 → 64-dim is a 16× byte cut ahead of the
    IVF/PQ/SQ ladder, at one fused map pass."""
    import math

    from duckdb_vss_spark.functions.distance import array_inner_product

    signs = random_projection_signs_dim(df, vec_col, out_dim, seed)
    payload = "[" + ",".join(
        "[" + ",".join(repr(float(signs[i, j]) ) for i in range(signs.shape[0])) + "]"
        for j in range(out_dim)
    ) + "]"
    smat = F.from_json(F.lit(payload), "array<array<double>>")
    v = F.col(vec_col).cast("array<double>")
    inv = F.lit(1.0 / math.sqrt(float(out_dim)))
    proj = F.transform(smat, lambda s: array_inner_product(v, s) * inv)
    return df.where(v.isNotNull()).withColumn(out_col, proj)


def random_projection_signs_dim(df, vec_col, out_dim, seed):
    """Sign matrix sized from the data's vector width (one-row probe)."""
    row = df.where(F.col(vec_col).isNotNull()).select(F.size(vec_col)).first()
    if row is None:
        raise ValueError("no non-null vectors")
    return random_projection_signs(int(row[0]), out_dim, seed)
