"""Deduplication operators for training-data pipelines at scale.

Five dedup families (BASELINE.json north star), each designed around
its 100 TB shuffle profile:

- **exact**: hash-groupBy on a fingerprint — one shuffle of (hash, id),
  never the payload.
- **n-gram Jaccard**: shingle-explode → inverted-index self-join.
  Exact but quadratic in the worst case; a shingle-frequency cap drops
  stop-shingles (df > max_df) to bound the join fan-out — the standard
  inverted-index trick.
- **MinHash + LSH**: H md5-derived min-hashes per doc → B bands →
  candidates join on band equality only (shuffle ∝ docs·B, not pairs²)
  → exact Jaccard verify on candidates. The scale path.
- **SimHash**: 64-bit signature via per-token hash bit-voting
  (Charikar); near-dups = signatures within hamming distance d,
  bucketed by band for the candidate join.
- **embedding cosine**: exact all-pairs over a self-join (oracle path)
  + random-hyperplane LSH bucketing (scale path).

Hashing is md5-based everywhere (not Spark's murmur3 ``hash()``) so the
DuckDB oracle can reproduce signatures byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from duckdb_vss_spark.functions.distance import array_cosine_similarity
from duckdb_vss_spark.pipeline.text import fingerprint, word_ngrams

__all__ = [
    "exact_dedup",
    "shingle_table",
    "jaccard_pairs",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
]


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group by normalized-text fingerprint; keep the lowest id of each
    group. Returns (fingerprint, keep_id, n_dups)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def _spread(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    source arrives in fewer partitions (a small parquet file reads as
    ONE split, which would serialize the explode-heavy stages below on
    a single core). At scale the input already has >= cores partitions
    and this is a no-op — no extra shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# --------------------------------------------------------------------------
# n-gram Jaccard
# --------------------------------------------------------------------------

def shingle_table(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, max_df: int | None = None
) -> DataFrame:
    """Distinct (id, shingle) pairs; optionally drop shingles appearing in
    more than ``max_df`` docs (stop-shingle cap — bounds self-join fan-out
    at scale; dropped shingles slightly *underestimate* Jaccard)."""
    sh = (
        _spread(df)
        .select(F.col(id_col).alias("id"), F.explode(word_ngrams(text_col, n)).alias("sh"))
        .where(F.length("sh") > 0)
        .distinct()
    )
    if max_df is not None:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(freq.where(F.col("df") <= max_df).select("sh"), "sh", "inner")
    # 60-bit shingle hash: self-joins shuffle 8-byte keys instead of raw
    # shingle text (engine-reproducible: md5-prefix, same value in any
    # SQL engine via hex→int; collisions ~2^-60 and mirrored by the
    # oracle, which hashes identically)
    return sh.withColumn(
        "shh", F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("long")
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over the inverted index: pairs (id_a < id_b)
    with |A∩B| / |A∪B| ≥ threshold. Returns (id_a, id_b, jaccard)."""
    sh = shingle_table(df, text_col, id_col, n, max_df).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # inverted-index self-join on the 8-byte shingle hash, not the text
    a = sh.select(F.col("id").alias("id_a"), "shh")
    b = sh.select(F.col("id").alias("id_b"), "shh")
    inter = (
        a.join(b, "shh")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            (F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).cast(
                "double"
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signature(
    df: DataFrame, text_col: str, id_col: str, num_hashes: int = 8, n: int = 3
) -> DataFrame:
    """Per-doc MinHash signature: hash_i(doc) = min over shingles of
    md5('<i>_' || shingle). md5-as-hash keeps the signature reproducible
    in any engine (the oracle recomputes it in SQL). Returns
    (id, h0..h{H-1})."""
    sh = shingle_table(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash → band-bucket candidate join → exact Jaccard verify.

    Shuffle profile: docs·bands rows into the candidate join (vs pairs²
    for the naive join), then exact verification only on candidates —
    the canonical LSH pipeline shape. Returns (id_a, id_b, jaccard)."""
    rows_per_band = num_hashes // bands
    # shingles feed both the signature and the verify stage; the banded
    # buckets feed both sides of the candidate self-join — persist both
    # so the self-joins don't recompute the whole upstream subtree.
    sh_cached = shingle_table(df, text_col, id_col, n).persist()
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}_"), F.col("sh")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = sh_cached.groupBy("id").agg(*aggs)
    band_cols = [
        F.md5(
            F.concat_ws("|", *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(str(b)), F.col(f"band{b}")) for b in range(bands)
            ])
        ).alias("bucket"),
    ).persist()
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # exact verify on the candidate set only: composite equi-join on
    # (id, shingle-hash) — the intersection is computed by the hash join
    # directly, never materializing |A|·|B| rows per candidate pair
    sh = sh_cached
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shh")
    b = sh.select(F.col("id").alias("id_b"), "shh")
    inter = (
        cand.join(a, "id_a")
        .join(b, ["id_b", "shh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            (F.col("inter").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).cast(
                "double"
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _nibble_value(ch: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """Charikar SimHash over whitespace tokens, md5-derived bits.

    Each token contributes ±1 to each of ``bits`` positions (bit b of
    md5's leading nibbles); the signature sets bit b iff the sum is
    positive. Expressed in native column ops (explode → bit votes →
    sum) so the oracle can reproduce it in SQL. Returns (id, simhash
    BIGINT)."""
    nibbles = bits // 4
    tok = _spread(df).select(
        F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.length("w") > 0)
    tok = tok.withColumn("h", F.md5(F.col("w")))
    votes = [
        (
            F.sum(
                F.when(
                    (F.shiftright(_nibble_value(F.substring(F.col("h"), nib + 1, 1)), 3 - bit) % 2)
                    == 1,
                    1,
                ).otherwise(-1)
            )
            > 0
        )
        .cast("long")
        .alias(f"b{nib * 4 + bit}")
        for nib in range(nibbles)
        for bit in range(4)
    ]
    sig = tok.groupBy("id").agg(*votes)
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = acc + F.col(f"b{i}") * F.lit(2 ** (bits - 1 - i)).cast("long")
    return sig.select("id", acc.alias("simhash"))


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation buckets on signature halves — join on bucket,
    verify exact hamming. Pigeonhole guarantees full recall only for
    hamming < #blocks (here: ≤1 with two halves); beyond that it is a
    deterministic approximate scheme (raise the block count for a hard
    guarantee — blocks > max_hamming)."""
    sig = simhash(df, text_col, id_col, bits).cache()
    half = bits // 2
    stacked = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                F.concat_ws(":", F.lit("hi"), F.shiftright("simhash", half).cast("string")),
                F.concat_ws(
                    ":", F.lit("lo"), (F.col("simhash") % F.lit(2**half)).cast("string")
                ),
            )
        ).alias("bucket"),
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.simhash").alias("sig_a"),
            F.col("y.id").alias("id_b"),
            F.col("y.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact all-pairs cosine near-dup (id_a < id_b, sim ≥ threshold).
    Quadratic — the oracle/verification path; use the LSH variant at
    scale."""
    # spread the probe side: a small parquet arrives as one split, which
    # would run the whole quadratic loop on a single core; the build side
    # broadcasts either way.
    a = _spread(df).select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", array_cosine_similarity(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def embedding_neardup_lsh(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
    num_planes: int = 64,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH: sign-bit signature over ``num_planes``
    hyperplanes, banded candidate join, exact cosine verify.

    Geometry: bits-per-band = num_planes/bands controls bucket count
    (2^bits per band — more buckets = better pruning, lower per-band
    recall), bands control recall (1 − (1 − p^bits)^bands where
    p = 1 − θ/π). Defaults (64 planes, 8 bands of 8 bits, 256 buckets/
    band) give ~93% recall at cos 0.9. Candidates are deduplicated on
    *ids only* and vectors re-joined afterwards, so wide embedding
    arrays are never shuffled through the candidate distinct — at scale
    the shuffle is docs·bands skinny rows, never pairs²."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    first = df.select(vec_col).first()
    dim = len(first[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    rows_per_band = num_planes // bands

    # all plane signs in ONE Arrow-batched matmul per batch: Spark
    # interprets higher-order array lambdas (no codegen), so num_planes
    # separate aggregate(zip_with(...)) columns would cost num_planes
    # interpreted array traversals per row; BLAS does it in one pass.
    planes_t = planes.T.copy()

    def _buckets(v):
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        bits = (mat @ planes_t > 0).astype(np.uint8)  # [n, num_planes]
        out = []
        for row in bits:
            out.append(
                [
                    f"{b}:" + "".join(chr(48 + x) for x in row[b * rows_per_band : (b + 1) * rows_per_band])
                    for b in range(bands)
                ]
            )
        return pd.Series(out)

    bucket_udf = pandas_udf(_buckets, ArrayType(StringType()))
    stacked = (
        df.select(F.col(id_col).alias("id"), bucket_udf(F.col(vec_col)).alias("bk"))
        .select("id", F.explode("bk").alias("bucket"))
        .persist()
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        cand.join(vecs.withColumnRenamed("id", "id_a").withColumnRenamed("v", "va"), "id_a")
        .join(vecs.withColumnRenamed("id", "id_b").withColumnRenamed("v", "vb"), "id_b")
        .withColumn("cos_sim", array_cosine_similarity(F.col("va"), F.col("vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
