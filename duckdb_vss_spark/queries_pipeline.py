"""Declared queries: training-data pipeline operators (north star).

Same conventions as queries.py. Oracle SQL for the hash-based operators
is generated programmatically so the Spark implementation and the SQL
stay structurally identical (md5-derived hashing everywhere — Spark's
murmur3 ``hash()`` is not reproducible in other engines, md5 is).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    simhash,
)
from duckdb_vss_spark.pipeline.text import (
    LANG_MARKERS,
    char_count,
    lang_id,
    quality_score,
    regex_token_count,
    stopword_ratio,
    token_count,
)
from duckdb_vss_spark.pipeline.bm25 import bm25_oracle_ctes, bm25_oracle_sql
from duckdb_vss_spark.pipeline.semdedup import (
    seeded_centroids,
    semdedup_oracle_sql,
)
from duckdb_vss_spark.queries import register, register_extra
from duckdb_vss_spark.sources import load_table

_EN = LANG_MARKERS["en"]
_EN_SQL = ", ".join(f"'{w}'" for w in _EN)

# DuckDB shingle CTE (word 3-grams, distinct per doc) — mirrors
# pipeline.text.word_ngrams + shingle_table
_SH_CTE = """
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 1, 1)),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      FROM words
    ),
    sh AS (
      SELECT doc_id, sh,
             CAST(('0x' || substr(md5(sh), 1, 15)) AS BIGINT) AS shh
      FROM sh0
    )
"""


@register(
    "q_text_stats",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe,
           CAST(len(list_filter(string_split(text, ' '), x -> x IN ({_EN_SQL}))) AS DOUBLE)
             / greatest(len(string_split(text, ' ')), 1) AS stop_ratio,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals + document fingerprint (north
    star: text analysis). The fp column is the normalized-text md5
    rolling fingerprint (pipeline.text.fingerprint) — the cheap first
    pass of a dedup pipeline, folded in here so one declared query
    covers the whole map-only text-stats surface."""
    docs = load_table(spark, sf_dir, "documents")
    from duckdb_vss_spark.pipeline.text import fingerprint

    return docs.select(
        "doc_id",
        char_count("text").alias("n_chars"),
        token_count("text").alias("n_tokens"),
        regex_token_count("text").alias("n_bpe"),
        stopword_ratio("text", _EN).alias("stop_ratio"),
        fingerprint("text").alias("fp"),
    )


def _lang_id_oracle() -> str:
    # per-lang score rows + window argmax (ties → lexicographically last
    # lang, matching array_max(struct(hits, lang)) on the Spark side)
    selects = " UNION ALL ".join(
        "SELECT doc_id, '{lang}' AS lang, len(list_filter(w, x -> x IN ({words}))) AS hits FROM words".format(
            words=", ".join(f"'{x}'" for x in ws), lang=lang
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    )
    return f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    scores AS ({selects})
    SELECT doc_id, lang AS pred_lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
      FROM scores
    ) WHERE rn = 1
    """


@register_extra("q_lang_id", _lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (argmax marker hits; ties → max lang name,
    identical struct-comparison semantics in both engines). Declared
    surface lives in q_lang_quality; kept here for bench/local checks."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id("text").alias("pred_lang"))


def _lang_quality_oracle() -> str:
    selects = " UNION ALL ".join(
        "SELECT doc_id, '{lang}' AS lang, len(list_filter(w, x -> x IN ({words}))) AS hits FROM words".format(
            words=", ".join(f"'{x}'" for x in ws), lang=lang
        )
        for lang, ws in sorted(LANG_MARKERS.items())
    )
    return f"""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    scores AS ({selects}),
    pred AS (
      SELECT doc_id, lang AS pred_lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang DESC) AS rn
        FROM scores
      ) WHERE rn = 1
    ),
    q AS (
      SELECT doc_id,
             (least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
              + CAST(len(list_distinct(w)) AS DOUBLE) / greatest(CAST(len(w) AS DOUBLE), 1.0)) / 2.0
               AS qscore
      FROM words
    )
    SELECT pred.doc_id, pred_lang, qscore FROM pred JOIN q ON pred.doc_id = q.doc_id
    """


@register("q_lang_quality", _lang_quality_oracle())
def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID + quality scoring in one declared query (north star:
    text analysis). Both are map-only column expressions over documents —
    argmax marker hits (ties → max lang name, identical struct-comparison
    semantics in both engines) and the length/distinct-ratio quality
    score — so one pass covers both surfaces; the stand-alone forms stay
    in the extra registry (q_lang_id, q_quality_score)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id("text").alias("pred_lang"),
        quality_score("text").alias("qscore"),
    )


@register(
    "q_exact_dedup",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id,
           count(*) AS n_dups
    FROM documents
    GROUP BY 1
    """,
)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text fingerprint (hash-groupBy: the
    only thing shuffled is (fp, id), never the payload)."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


@register_extra(
    "q_quality_score",
    """
    SELECT doc_id,
           (least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
            + CAST(len(list_distinct(w)) AS DOUBLE) / greatest(CAST(len(w) AS DOUBLE), 1.0)) / 2.0
             AS qscore
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score("text").alias("qscore"))


def _minhash_oracle(num_hashes: int = 4) -> str:
    mins = ", ".join(
        f"min(md5('{i}_' || sh)) AS h{i}" for i in range(num_hashes)
    )
    return f"WITH {_SH_CTE} SELECT doc_id AS id, {mins} FROM sh GROUP BY doc_id"


@register_extra("q_minhash_signature", _minhash_oracle(4))
def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (md5-derived, engine-reproducible)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_signature(docs, "text", "doc_id", num_hashes=4)


@register(
    "q_ngram_jaccard",
    f"""
    WITH {_SH_CTE},
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n
      FROM sh a JOIN sh b ON a.shh = b.shh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(n AS DOUBLE) / (x.sz + y.sz - n) AS jaccard
    FROM inter
    JOIN sz x ON id_a = x.doc_id
    JOIN sz y ON id_b = y.doc_id
    WHERE CAST(n AS DOUBLE) / (x.sz + y.sz - n) >= 0.1
    """,
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join."""
    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.1)


def _minhash_lsh_oracle(num_hashes: int = 8, bands: int = 4, threshold: float = 0.1) -> str:
    rpb = num_hashes // bands
    mins = ", ".join(f"min(md5('{i}_' || sh)) AS h{i}" for i in range(num_hashes))
    band_exprs = ", ".join(
        "md5("
        + " || '|' || ".join(f"h{b * rpb + r}" for r in range(rpb))
        + f") AS band{b}"
        for b in range(bands)
    )
    bucket_list = ", ".join(f"'{b}:' || band{b}" for b in range(bands))
    return f"""
    WITH {_SH_CTE},
    sig AS (SELECT doc_id AS id, {mins} FROM sh GROUP BY doc_id),
    banded AS (SELECT id, {band_exprs} FROM sig),
    stacked AS (SELECT id, unnest([{bucket_list}]) AS bucket FROM banded),
    cand AS (
      SELECT DISTINCT x.id AS id_a, y.id AS id_b
      FROM stacked x JOIN stacked y ON x.bucket = y.bucket AND x.id < y.id
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT id_a, id_b, count(*) AS n
      FROM cand
      JOIN sh a ON a.doc_id = id_a
      JOIN sh b ON b.doc_id = id_b AND a.shh = b.shh
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, CAST(n AS DOUBLE) / (x.sz + y.sz - n) AS jaccard
    FROM inter JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
    WHERE CAST(n AS DOUBLE) / (x.sz + y.sz - n) >= {threshold}
    """


@register("q_minhash_lsh", _minhash_lsh_oracle())
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pipeline (shingle→minhash→band→bucket-join→
    verify). The oracle replicates the identical banding, so the
    approximate candidate set matches deterministically."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=8, bands=4, n=3, threshold=0.1
    )


def _incremental_cte(num_hashes: int = 8, bands: int = 4, threshold: float = 0.1) -> str:
    """Shared CTE chain for the incremental (new-batch vs reference
    store) dedup oracles: the q_minhash_lsh banding with the self-join
    replaced by a new(id%5=0) x ref(id%5<>0) cross-store join."""
    rpb = num_hashes // bands
    mins = ", ".join(f"min(md5('{i}_' || sh)) AS h{i}" for i in range(num_hashes))
    band_exprs = ", ".join(
        "md5("
        + " || '|' || ".join(f"h{b * rpb + r}" for r in range(rpb))
        + f") AS band{b}"
        for b in range(bands)
    )
    bucket_list = ", ".join(f"'{b}:' || band{b}" for b in range(bands))
    return f"""
    WITH {_SH_CTE},
    sig AS (SELECT doc_id AS id, {mins} FROM sh GROUP BY doc_id),
    banded AS (SELECT id, {band_exprs} FROM sig),
    stacked AS (SELECT id, unnest([{bucket_list}]) AS bucket FROM banded),
    cand AS (
      SELECT DISTINCT n.id AS new_id, r.id AS ref_id
      FROM stacked n JOIN stacked r
        ON n.bucket = r.bucket AND n.id % 5 = 0 AND r.id % 5 <> 0
    ),
    sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT new_id, ref_id, count(*) AS n
      FROM cand
      JOIN sh a ON a.doc_id = new_id
      JOIN sh b ON b.doc_id = ref_id AND a.shh = b.shh
      GROUP BY 1, 2
    ),
    matches AS (
      SELECT new_id, ref_id, CAST(n AS DOUBLE) / (x.sz + y.sz - n) AS jaccard
      FROM inter JOIN sz x ON new_id = x.doc_id JOIN sz y ON ref_id = y.doc_id
      WHERE CAST(n AS DOUBLE) / (x.sz + y.sz - n) >= {threshold}
    )
    """


@register_extra(
    "q_incremental_dedup",
    _incremental_cte() + "SELECT new_id, ref_id, jaccard FROM matches",
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup (pipeline/dedup.py minhash_match_store): the
    production daily-crawl shape — a new batch (doc_id % 5 = 0)
    deduplicates against the persisted signature store of the existing
    corpus (the rest) without re-shingling history. One shared Arrow
    pass builds the store; the cross-store band join broadcasts the
    small (new) side at scale."""
    from duckdb_vss_spark.pipeline.dedup import _materialize, minhash_store

    docs = load_table(spark, sf_dir, "documents")
    store = _materialize(minhash_store(docs, "text", "doc_id", num_hashes=8, n=3))
    new = store.where(F.col("id") % 5 == 0)
    ref = store.where(F.col("id") % 5 != 0)
    from duckdb_vss_spark.pipeline.dedup import minhash_match_store

    return minhash_match_store(new, ref, num_hashes=8, bands=4, threshold=0.1)


@register_extra(
    "q_stream_dedup_store",
    _incremental_cte() + "SELECT new_id, ref_id, jaccard FROM matches",
)
def q_stream_dedup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING incremental dedup, oracle-checked through the sink:
    the new-batch docs (doc_id % 5 = 0) arrive as TWO micro-batches
    (staged part files, maxFilesPerTrigger=1) and each batch MinHash-
    matches against the static reference store inside foreachBatch
    (streaming/ops.py streaming_dedup_against_store). The appended
    sink table must equal the one-shot batch oracle — pinning that the
    result is invariant to micro-batch boundaries, which is what makes
    the stream restartable mid-backlog."""
    import shutil
    import uuid

    from duckdb_vss_spark.pipeline.dedup import _materialize, minhash_store
    from duckdb_vss_spark.streaming import streaming_dedup_against_store

    docs = load_table(spark, sf_dir, "documents")
    store = _materialize(minhash_store(docs, "text", "doc_id", num_hashes=8, n=3))
    ref = store.where(F.col("id") % 5 != 0)

    tag = uuid.uuid4().hex[:8]
    stage = f"/tmp/vss_sdstage_{tag}"
    sink = f"/tmp/vss_sdsink_{tag}"
    ckpt = f"/tmp/vss_sdckpt_{tag}"
    try:
        # two part files -> two micro-batches
        docs.where(F.col("doc_id") % 5 == 0).repartition(2).write.parquet(stage)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        q = streaming_dedup_against_store(
            stream, ref, sink, ckpt, "text", "doc_id",
            num_hashes=8, bands=4, n=3, threshold=0.1,
        )
        q.awaitTermination(120)
        out = spark.read.parquet(sink).select("new_id", "ref_id", "jaccard")
        out = out.localCheckpoint(eager=True)  # detach from the tmp files
    finally:
        for p in (stage, sink, ckpt):
            shutil.rmtree(p, ignore_errors=True)
    return out


@register_extra(
    "q_incremental_dedup_keep",
    _incremental_cte()
    + """
    SELECT DISTINCT doc_id AS id FROM sh
    WHERE doc_id % 5 = 0
      AND doc_id NOT IN (SELECT new_id FROM matches)
    """,
)
def q_incremental_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental keep-list: new-batch ids with no near-dup in the
    reference store — what the pipeline appends to the store."""
    from duckdb_vss_spark.pipeline.dedup import (
        _materialize,
        minhash_incremental_keep,
        minhash_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = _materialize(minhash_store(docs, "text", "doc_id", num_hashes=8, n=3))
    new = store.where(F.col("id") % 5 == 0)
    ref = store.where(F.col("id") % 5 != 0)
    return minhash_incremental_keep(new, ref, num_hashes=8, bands=4, threshold=0.1)


def _simhash_oracle(bits: int = 16) -> str:
    """SimHash signature SQL, sf0.1-capable (VERDICT r10 #4): ONE
    hex→integer cast per token (`CAST('0x'||substr(md5,1,bits/4))`),
    then integer shift-and votes per bit — replaces the per-bit
    strpos/substr CASE chains (bit i of the token hash prefix v is
    `(v >> bits-1-i) & 1`, and sum(±1 votes) > 0 ⇔ 2·sum(bit) >
    count). Verified bit-identical to the old per-nibble formulation
    at sf0.01 and sf0.1 (r11)."""
    nhex = bits // 4
    vote_cols = [
        f"CAST(2 * sum((v >> {bits - 1 - i}) & 1) - count(*) > 0 AS BIGINT) AS b{i}"
        for i in range(bits)
    ]
    acc = " + ".join(f"b{i} * {2 ** (bits - 1 - i)}" for i in range(bits))
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(unnest(string_split(text, ' '))), 1, {nhex}) AS BIGINT) AS v
      FROM documents
    ),
    bits AS (SELECT doc_id, {", ".join(vote_cols)} FROM tok GROUP BY doc_id)
    SELECT doc_id AS id, CAST({acc} AS BIGINT) AS simhash FROM bits
    """


@register_extra("q_simhash", _simhash_oracle(16))
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charikar SimHash signatures (16-bit, md5-nibble bit votes)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs, "text", "doc_id", bits=16)


@register_extra(
    "q_normalize_text",
    """
    SELECT doc_id,
           trim(regexp_replace(
             lower(nfc_normalize('  A' || 'e' || chr(769) || ' ' || text || '  B  ')),
             '\\s+', ' ', 'g')) AS norm
    FROM documents
    """,
)
def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (pipeline/text.normalize_text, NEW
    r11): NFC composition + casefold + whitespace collapse — the pass
    before fingerprint/dedup so "e"+U+0301 and "é" hash identically.
    The query injects a decomposed sequence plus case/whitespace noise
    around every document, so the oracle (DuckDB utf8proc
    nfc_normalize vs Python unicodedata — same Unicode standard)
    fails on any normalization, casing or collapse bug."""
    from duckdb_vss_spark.pipeline.text import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    noisy = F.concat(
        F.lit("  A"), F.lit("e\u0301"), F.lit(" "), F.col("text"), F.lit("  B  ")
    )
    return docs.select("doc_id", normalize_text(noisy).alias("norm"))


@register_extra(
    "q_fingerprint",
    """
    SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (rolling-normalization + md5): the cheap
    first pass of a dedup pipeline — identical fingerprints are exact
    dups after whitespace/case normalization."""
    from duckdb_vss_spark.pipeline.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


# --------------------------------------------------------------------------
# Multimodal plumbing (north star): payloads synthesized from document
# bytes (the container has no codec libs; TESTDATA has no binary column),
# deterministic ids so the oracle can reproduce the relational shape.
# --------------------------------------------------------------------------


def _media_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckdb_vss_spark.pipeline.multimodal import attach_media_metadata

    docs = load_table(spark, sf_dir, "documents")
    # payload = utf8 bytes of the text; duration 10 ms per char
    return attach_media_metadata(
        docs.withColumn("payload", F.encode("text", "UTF-8")),
        "payload",
        kind="video",
        fmt="mp4",
        id_col="doc_id",
        duration_ms=F.col("n_chars") * 10,
    )


@register(
    "q_media_frame_sample",
    """
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, greatest(CAST(floor(n_chars * 10 / 1000) AS INT), 1))) AS INT) AS frame_idx,
           CAST(unnest(range(0, greatest(CAST(floor(n_chars * 10 / 1000) AS INT), 1))) * 1000 AS BIGINT) AS frame_ts_ms
    FROM documents
    """,
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame at a
    1000 ms stride from the typed duration metadata. The decode itself is
    behind the stub seam (multimodal.py); the relational shape — explode
    of a per-row frame sequence — is the real, scale-relevant part."""
    from duckdb_vss_spark.pipeline.multimodal import sample_frames

    return sample_frames(_media_df(spark, sf_dir), every_ms=1000)


@register_extra(
    "q_media_features_shape",
    "SELECT doc_id AS media_id, CAST(64 AS INT) AS dim FROM documents",
)
def q_media_features_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing: every payload flows through the
    Arrow-batched decode UDF and yields a fixed-dimension vector. The
    oracle pins the relational contract (every media_id present, dim
    constant); the fake-codec values themselves are meaningless."""
    from duckdb_vss_spark.pipeline.multimodal import extract_features

    feats = extract_features(_media_df(spark, sf_dir), dim=64)
    return feats.select("media_id", F.size("feature").cast("int").alias("dim"))


@register(
    "q_media_resize",
    """
    SELECT doc_id AS media_id, CAST(32 AS BIGINT) AS payload_len,
           CAST(8 AS INT) AS width, CAST(4 AS INT) AS height,
           CAST(64 AS INT) AS dim
    FROM documents
    """,
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize + feature-extraction plumbing: every payload flows through
    the Arrow-batched payload-in/payload-out resize UDF (back exactly
    width·height bytes with meta dims set) AND the decode/feature UDF
    (fixed-dimension vector), joined per media_id. The oracle pins the
    relational contract (every media_id, exact payload size, dims,
    feature dim constant); the fake-codec bytes themselves are
    meaningless (codec libs absent — see extract_features/resize_media
    for the real-PNG path)."""
    from duckdb_vss_spark.pipeline.multimodal import extract_features, resize_media

    media = _media_df(spark, sf_dir)
    out = resize_media(media, width=8, height=4).select(
        "media_id",
        F.length("payload").cast("long").alias("payload_len"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    dims = extract_features(media, dim=64).select(
        "media_id", F.size("feature").cast("int").alias("dim")
    )
    return out.join(dims, "media_id")


@register(
    "q_embedding_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos_sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
)
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact all-pairs form; the LSH
    variant is the scale path, exercised in tests/bench)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, "embedding", "vec_id", threshold=0.4)


@register(
    "q_stream_window_counts",
    """
    SELECT CAST(epoch_us(ts) - (epoch_us(ts) % 300000000) AS BIGINT) AS window_start_us,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming, oracle-checked: the watermarked 5-minute
    tumbling-window aggregate runs as a real stream (file source,
    availableNow trigger, complete mode to a memory sink) and must agree
    with the batch SQL over the same events. Streaming is a north-star
    extension (the reference has none, SURVEY §2.2); the decimal-cast sum
    makes float accumulation order-independent across both engines."""
    import uuid

    from duckdb_vss_spark.streaming import read_events_stream, windowed_event_counts

    ev = read_events_stream(spark, sf_dir)
    agg = windowed_event_counts(ev, window="5 minutes", exact_sum=True)
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_value"),
    )


@register(
    "q_stream_session_windows",
    """
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, value FROM events
    ),
    gaps AS (
      SELECT user_id, event_id, us, value,
        CASE WHEN us - lag(us) OVER w > 1800000000
               OR lag(us) OVER w IS NULL
             THEN 1 ELSE 0 END AS new_s
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
      SELECT user_id, us, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM gaps
    )
    SELECT user_id,
           min(us) AS session_start_us,
           max(us) + 1800000000 AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
)
def q_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows, oracle-checked: a REAL availableNow
    stream through Spark's native session_window (gap merge, end = last
    event + gap) must agree with the batch lag/flag-sum sessionization
    SQL. Complements q_stream_window_counts (tumbling) with the gap-based
    stateful window — the applyInPandasWithState-class surface expressed
    through the built-in operator."""
    import uuid

    from duckdb_vss_spark.streaming import read_events_stream, session_window_stats

    ev = read_events_stream(spark, sf_dir)
    agg = session_window_stats(ev, gap="30 minutes", exact_sum=True)
    sink = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).select(
        "user_id",
        F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
        F.unix_micros(F.col("session_window.end")).alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


@register(
    "q_stream_dedup_state",
    """
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           min(doc_id) AS keep_id
    FROM documents
    GROUP BY 1
    """,
)
def q_stream_dedup_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState),
    oracle-checked: streaming exact-dedup keyed by content fingerprint —
    per-key state emits the first (lowest-id) occurrence exactly once.
    Run as a real availableNow stream; with the whole table in one
    micro-batch the emitted representative is min(doc_id) per
    fingerprint, which the batch SQL reproduces. The state itself (drop
    re-occurrences in LATER batches) is pinned by
    tests/test_streaming.py's two-batch restart test."""
    import uuid

    from duckdb_vss_spark.pipeline.text import fingerprint
    from duckdb_vss_spark.streaming import read_documents_stream, streaming_dedup_first

    docs = read_documents_stream(spark, sf_dir)
    dedup = streaming_dedup_first(
        docs.select(fingerprint("text").alias("fp"), F.col("doc_id")), "fp", "doc_id"
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        dedup.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).select("fp", "keep_id")


def _neardup_lsh_oracle(
    threshold: float = 0.4,
    num_planes: int = 64,
    bands: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> str:
    """Random-hyperplane LSH oracle: the planes are a deterministic
    function of the seed, so the SQL inlines them as literals and
    reproduces the sign-bit bucketing exactly (then the exact cosine
    verify on candidates, like the Spark side)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))
    rpb = num_planes // bands
    band_exprs = []
    for b in range(bands):
        bits = " || ".join(
            "(CASE WHEN list_dot_product(v, ["
            + ", ".join(repr(float(x)) for x in planes[b * rpb + r])
            + "]) > 0.0 THEN '1' ELSE '0' END)"
            for r in range(rpb)
        )
        band_exprs.append(f"'{b}:' || {bits} AS band{b}")
    bucket_list = ", ".join(f"band{b}" for b in range(bands))
    return f"""
    WITH sig AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    banded AS (SELECT id, {", ".join(band_exprs)} FROM sig),
    stacked AS (SELECT id, unnest([{bucket_list}]) AS bucket FROM banded),
    cand AS (
      SELECT DISTINCT x.id AS id_a, y.id AS id_b
      FROM stacked x JOIN stacked y ON x.bucket = y.bucket AND x.id < y.id
    )
    SELECT id_a, id_b, list_cosine_similarity(a.v, b.v) AS cos_sim
    FROM cand JOIN sig a ON a.id = id_a JOIN sig b ON b.id = id_b
    WHERE list_cosine_similarity(a.v, b.v) >= {threshold}
    """


@register("q_embedding_neardup_lsh", _neardup_lsh_oracle())
def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via random-hyperplane LSH — the SCALE path
    (docs·bands skinny-row shuffle, id-only candidate dedup, exact
    cosine verify on candidates only), now oracle-checked: the seeded
    hyperplanes are inlined into the SQL as literals so DuckDB
    reproduces the identical bucketing and candidate set."""
    from duckdb_vss_spark.pipeline.dedup import embedding_neardup_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup_lsh(
        emb, "embedding", "vec_id", threshold=0.4, num_planes=64, bands=8, seed=42
    )


def _simhash_pairs_oracle(bits: int = 16, max_hamming: int = 3) -> str:
    half = bits // 2
    sig_sql = _simhash_oracle(bits).strip()
    return f"""
    WITH sig AS ({sig_sql}),
    stacked AS (
      SELECT id, simhash,
             unnest(['hi:' || CAST(simhash // {2 ** half} AS VARCHAR),
                     'lo:' || CAST(simhash % {2 ** half} AS VARCHAR)]) AS bucket
      FROM sig
    ),
    cand AS (
      SELECT DISTINCT x.id AS id_a, x.simhash AS sig_a, y.id AS id_b, y.simhash AS sig_b
      FROM stacked x JOIN stacked y ON x.bucket = y.bucket AND x.id < y.id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


@register(
    "q_hash_sample",
    f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST('0x' || substr(md5('42_' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          < {int(0.1 * float(2 ** 60))}
    """,
)
def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sampling (pipeline/sample.hash_sample):
    the kept set is a pure function of (seed, id) — identical on any
    engine/partitioning, unlike df.sample's per-partition RNG. The
    oracle recomputes the identical 60-bit md5-prefix threshold."""
    from duckdb_vss_spark.pipeline.sample import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1, seed=42).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "q_shuffle_shards",
    """
    SELECT doc_id,
           CAST('0x' || substr(md5('7_' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS pos,
           CAST(CAST('0x' || substr(md5('7_' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 16 AS INT) AS shard
    FROM documents
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded global shuffle-shard assignment for training export
    (pipeline/sample.shuffle_shards): shard routing + within-shard order
    from one 60-bit keyed hash — a deterministic global permutation in
    one shuffle, never a global payload sort."""
    from duckdb_vss_spark.pipeline.sample import shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, "doc_id", 16, seed=7).select(
        "doc_id", "pos", "shard"
    )


def _dedup_clusters_oracle(rounds: int = 12) -> str:
    """Connected components as UNROLLED hash-to-min with pointer
    shortcutting (VERDICT r10 #4 — the old recursive-CTE `reach`
    accumulated EVERY (node, reachable-label) pair, Σ|component|² rows
    times the edge fan-out, >9.5 min at sf0.1; this form keeps ONE
    label per node per round and converges in O(log diameter) rounds:
    each round takes the min label over self+neighbors, then shortcuts
    through the current label's own label — 12 rounds covers any
    diameter ≤ 2^12). Every CTE is MATERIALIZED: each round references
    the previous one twice, and DuckDB would otherwise inline the
    chain into 2^rounds copies of the base scan. Verified equal to the
    recursive-fixpoint formulation at sf0.01 and 170× faster at sf0.1
    (>570 s → 3.5 s)."""
    pairs_sql = _simhash_pairs_oracle().strip()
    parts = [
        f"""pairs AS MATERIALIZED ({pairs_sql}),
    edges AS MATERIALIZED (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    lab0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lab FROM edges)"""
    ]
    for k in range(rounds + 1):  # +1: the convergence-guard round
        parts.append(f"""
    nm{k} AS MATERIALIZED (
      SELECT l.id, least(l.lab, min(l2.lab)) AS lab
      FROM lab{k} l JOIN edges e ON e.src = l.id JOIN lab{k} l2 ON l2.id = e.dst
      GROUP BY l.id, l.lab
    ),
    lab{k + 1} AS MATERIALIZED (
      SELECT a.id, least(a.lab, b.lab) AS lab
      FROM nm{k} a JOIN nm{k} b ON b.id = a.lab
    )""")
    # Convergence guard (ADVICE r11): the fixed round count silently
    # mislabels any component whose effective diameter outruns it —
    # emit one extra round and fail LOUDLY (zero rows -> row-count
    # mismatch) if it still changed anything. The guard subquery is
    # uncorrelated, so both engines evaluate it once.
    return f"""
    WITH {",".join(parts)}
    SELECT id, lab AS cluster_id FROM lab{rounds + 1}
    WHERE NOT EXISTS (
      SELECT 1 FROM lab{rounds} a JOIN lab{rounds + 1} b
      ON a.id = b.id AND a.lab <> b.lab
    )
    """


@register("q_dedup_clusters", _dedup_clusters_oracle())
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster resolution: near-dup pairs → connected components →
    canonical id per component (min id). Near-dup is not transitive, so
    a keep-list built from raw pairs over-deletes; clustering is the
    step a real pipeline runs before dropping documents. Spark side is
    iterative min-label propagation (pipeline/dedup.dedup_clusters,
    O(diameter) rounds of skinny (id, lab) shuffles); the oracle is the
    same fixpoint as a DuckDB recursive CTE over the identical
    (engine-reproducible) simhash pair list."""
    from duckdb_vss_spark.pipeline.dedup import dedup_clusters, simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs, "text", "doc_id", bits=16, max_hamming=3, blocks=2)
    return dedup_clusters(pairs)


@register("q_simhash_pairs", _simhash_pairs_oracle())
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: bucketing on signature halves, bucket
    equi-join, exact hamming verify — shuffle ∝ docs·2, never pairs².
    Half-bucketing is deterministic-approximate above hamming 1
    (pigeonhole needs blocks > max_hamming for a hard guarantee); the
    oracle replicates the identical bucketing, so both engines see the
    same candidate set."""
    from duckdb_vss_spark.pipeline.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    # 16-bit/2-block is the declared SQL-reproducible oracle shape; the
    # scale defaults are 64-bit/4-block (full recall at hamming ≤ 3)
    out = simhash_pairs(docs, "text", "doc_id", bits=16, max_hamming=3, blocks=2)
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


@register_extra(
    "q_media_audio_energy",
    """
    SELECT doc_id AS media_id,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.5 END AS DOUBLE) AS e0,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1.0 ELSE 0.5 END AS DOUBLE) AS e1,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0.5 ELSE 1.0 END AS DOUBLE) AS e2,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 0.5 ELSE 1.0 END AS DOUBLE) AS e3
    FROM documents
    """,
)
def q_media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec, value-checked end-to-end: per doc, synthesize a
    64-sample WAV whose loud half (amplitude 0.5) and quiet half (0.25)
    flip with doc parity, push the bytes through the pipeline's real
    RIFF/PCM decode + frame-energy feature (pipeline/wav.py inside
    Arrow-batched mapInPandas), and emit the 4 frame energies. The
    amplitudes are chosen so 16-bit quantization is exact (0.5 →
    16384/32768, 0.25 → 8192/32768), making the peak-normalized
    energies exactly {1.0, 0.5} — the oracle derives them from parity
    alone, so ANY codec bug (header, widths, scaling, framing) breaks
    the value match."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from duckdb_vss_spark.pipeline.multimodal import (
        attach_media_metadata,
        extract_features,
    )

    def _synth(doc_id):
        from duckdb_vss_spark.pipeline.wav import encode_wav

        out = []
        for d in doc_id:
            loud_first = int(d) % 2 == 0
            a, b = (0.5, 0.25) if loud_first else (0.25, 0.5)
            sig = np.concatenate([np.full(32, a), np.full(32, b)])
            out.append(encode_wav(sig, 8000))
        return pd.Series(out)

    synth = pandas_udf(_synth, BinaryType())

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = attach_media_metadata(
        docs.withColumn("payload", synth(F.col("doc_id"))),
        "payload",
        kind="audio",
        fmt="wav",
        id_col="doc_id",
    )
    feats = extract_features(media, dim=4, decoder="wav")
    return feats.select(
        "media_id",
        *[F.col("feature")[i].cast("double").alias(f"e{i}") for i in range(4)],
    )


@register_extra(
    "q_media_jpeg_pipeline",
    """
    SELECT doc_id AS media_id,
           CAST(4 AS INT) AS height, CAST(8 AS INT) AS width,
           CAST(16 AS INT) AS dim,
           CAST(1.0 AS DOUBLE) AS f_first
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def q_media_jpeg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end: per sampled doc, synthesize a
    white-top gradient, encode baseline JPEG (pipeline/jpeg.py), run
    the real resize (decode → resample → re-encode JPEG) and the real
    feature grid (decode → gray → sampled grid), and emit the decoded
    output dims plus the first grid sample. The top row is pure white,
    which survives JPEG's DCT/quantization exactly (uniform 8×8 blocks
    have only a DC coefficient), so f_first pins decoded VALUES — a
    codec bug in either direction breaks the match, not just shapes."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from duckdb_vss_spark.pipeline.multimodal import (
        attach_media_metadata,
        extract_features,
        resize_media,
    )

    def _synth(doc_id):
        from duckdb_vss_spark.pipeline.jpeg import encode_jpeg

        out = []
        for _d in doc_id:
            img = np.full((32, 32), 255, dtype=np.uint8)
            img[16:, :] = 0  # white top half, black bottom half
            out.append(encode_jpeg(img, quality=90))
        return pd.Series(out)

    synth = pandas_udf(_synth, BinaryType())
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0).select("doc_id")
    media = attach_media_metadata(
        docs.withColumn("payload", synth(F.col("doc_id"))),
        "payload",
        kind="image",
        fmt="jpeg",
        id_col="doc_id",
    )
    # r16 (guide §4.4): media fans out into resize_media AND
    # extract_features below — without materialization both join
    # branches re-run the Python JPEG encode over the whole sample
    # (the plan carried _synth twice). Same fix as the near-dup pair
    # joins (imagehash.py): encode once, both branches read blocks.
    from duckdb_vss_spark.pipeline.dedup import _materialize

    media = _materialize(media)

    def _dims(payload):
        from duckdb_vss_spark.pipeline.jpeg import decode_jpeg

        hs, ws = [], []
        for p in payload:
            img = decode_jpeg(bytes(p))
            hs.append(img.shape[0])
            ws.append(img.shape[1])
        return pd.DataFrame({"h": hs, "w": ws})

    from pyspark.sql.types import IntegerType, StructField, StructType

    dims_udf = pandas_udf(
        _dims, StructType([StructField("h", IntegerType()), StructField("w", IntegerType())])
    )
    resized = resize_media(media, width=8, height=4, decoder="jpeg").select(
        "media_id", dims_udf(F.col("payload")).alias("d")
    )
    feats = extract_features(media, dim=16, decoder="jpeg").select(
        "media_id", F.col("feature")[0].cast("double").alias("f_first")
    )
    return resized.join(feats, "media_id").select(
        "media_id",
        F.col("d.h").alias("height"),
        F.col("d.w").alias("width"),
        F.lit(16).cast("int").alias("dim"),
        "f_first",
    )


@register_extra(
    "q_media_video_probe",
    """
    SELECT doc_id AS media_id,
           CAST(n_chars * 10 AS BIGINT) AS duration_ms,
           CAST(320 AS INT) AS width,
           CAST(240 AS INT) AS height,
           CAST(greatest(CAST(floor(n_chars * 10 / 1000) AS INT), 1) AS INT) AS n_frames
    FROM documents WHERE doc_id % 10 = 1
    """,
)
def q_media_video_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-metadata path, value-checked: per sampled doc,
    assemble a minimal ISO-BMFF container (ftyp + moov{mvhd,trak{tkhd}})
    whose mvhd duration is n_chars·10 ms, probe it back through
    pipeline/mp4.py inside mapInPandas (probe_video_metadata), and
    count sample_frames' 1 fps grid. The oracle derives every value
    from n_chars alone, so any box-walk/timescale/fixed-point bug
    breaks the match."""
    import struct

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from duckdb_vss_spark.pipeline.multimodal import (
        attach_media_metadata,
        probe_video_metadata,
        sample_frames,
    )

    def _mux(n_chars):
        def box(btype, body):
            return struct.pack(">I", len(body) + 8) + btype + body

        out = []
        for nc in n_chars:
            dur = int(nc) * 10  # ms at timescale 1000
            mvhd = box(
                b"mvhd",
                b"\x00" * 4 + b"\x00" * 8 + struct.pack(">II", 1000, dur) + b"\x00" * 80,
            )
            tkhd = box(
                b"tkhd",
                b"\x00\x00\x00\x07" + b"\x00" * 72
                + struct.pack(">II", 320 << 16, 240 << 16),
            )
            out.append(
                box(b"ftyp", b"isom\x00\x00\x02\x00isom")
                + box(b"moov", mvhd + box(b"trak", tkhd))
            )
        return pd.Series(out)

    mux = pandas_udf(_mux, BinaryType())
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 1)
        .select("doc_id", "n_chars")
    )
    media = attach_media_metadata(
        docs.withColumn("payload", mux(F.col("n_chars"))),
        "payload",
        kind="video",
        fmt="mp4",
        id_col="doc_id",
    )
    probed = probe_video_metadata(media)
    # r16 (guide §4.4): probed fans out into sample_frames AND the meta
    # projection below — without materialization both join branches
    # re-run the Python mux AND the container probe (the plan carried
    # _mux and the probe's MapInPandas twice). Mux+probe once; both
    # branches read blocks (the imagehash.py fix).
    from duckdb_vss_spark.pipeline.dedup import _materialize

    probed = _materialize(probed)
    frames = (
        sample_frames(probed, every_ms=1000)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_frames"))
    )
    meta = probed.select(
        "media_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return meta.join(frames, "media_id")


# --------------------------------------------------------------------------
# Round 6: curation-pipeline surface — repetition/quality filters, PII
# scrubbing, corpus vocabulary + OOV, train/eval contamination detection
# --------------------------------------------------------------------------

@register(
    "q_repetition_stats",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    toks AS (SELECT doc_id, unnest(w) AS tok, generate_subscripts(w, 1) AS pos FROM words),
    runs AS (
      SELECT doc_id, tok,
             pos - row_number() OVER (PARTITION BY doc_id, tok ORDER BY pos) AS grp
      FROM toks
    ),
    maxrun AS (
      SELECT doc_id, CAST(max(cnt) AS INT) AS max_run FROM (
        SELECT doc_id, tok, grp, count(*) AS cnt FROM runs GROUP BY 1, 2, 3
      ) GROUP BY doc_id
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w), 1)),
                    i -> w[i] || ' ' || w[i+1])) AS gm
      FROM words
    ),
    gstat AS (
      SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM (
        SELECT doc_id, gm, count(*) AS c FROM grams GROUP BY 1, 2
      ) GROUP BY doc_id
    ),
    base AS (
      SELECT doc_id,
             1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1) AS dup_frac,
             CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
               / greatest(len(w), 1) AS mean_wlen
      FROM words
    )
    SELECT b.doc_id, m.max_run,
           COALESCE(CAST(g.mx AS DOUBLE) / g.tot, 0.0) AS top_bigram_frac,
           b.dup_frac, b.mean_wlen,
           (m.max_run <= 2 AND COALESCE(CAST(g.mx AS DOUBLE) / g.tot, 0.0) <= 0.07
            AND b.dup_frac <= 0.68 AND b.mean_wlen BETWEEN 2.0 AND 10.0) AS keep
    FROM base b JOIN maxrun m USING (doc_id) LEFT JOIN gstat g USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters (pipeline/quality.py): longest
    same-token run, top-bigram mass fraction, duplicate-token fraction,
    mean word length, and the AND-of-cutoffs keep decision — all pure
    map-only Column folds (in-row sorted-run statistics, never an
    explode+shuffle per doc). The oracle computes the same values
    relationally (gaps-and-islands / unnest+group), pinning the fold
    semantics from an independent direction."""
    from duckdb_vss_spark.pipeline.quality import (
        duplicate_token_fraction,
        max_token_run,
        mean_word_length,
        repetition_keep,
        top_ngram_fraction,
    )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        max_token_run("text").alias("max_run"),
        top_ngram_fraction("text", 2).alias("top_bigram_frac"),
        duplicate_token_fraction("text").alias("dup_frac"),
        mean_word_length("text").alias("mean_wlen"),
        repetition_keep("text").alias("keep"),
    )


def _pii_aug_sql() -> str:
    return """
      SELECT doc_id, text
        || CASE WHEN doc_id % 2 = 0 THEN ' contact admin' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
        || CASE WHEN doc_id % 3 = 0 THEN ' see http://ex.example/d/' || CAST(doc_id AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.1' ELSE '' END
        || CASE WHEN doc_id % 7 = 0 THEN ' call +1-555-0' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ELSE '' END
        AS t FROM documents
    """


def _pii_scrub_oracle() -> str:
    from duckdb_vss_spark.pipeline.scrub import PII_PATTERNS

    chain = "t"
    for _, pat, repl in PII_PATTERNS:
        chain = f"regexp_replace({chain}, '{pat}', '{repl}', 'g')"
    counts = ",\n      ".join(
        f"CAST(len(regexp_extract_all(t, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    return f"""
    WITH aug AS ({_pii_aug_sql()})
    SELECT doc_id, md5({chain}) AS clean_fp,
      {counts}
    FROM aug
    """


@register("q_pii_scrub", _pii_scrub_oracle())
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub pass (pipeline/scrub.py): typed regex redaction (URL →
    email → IPv4 → phone, fixed order) + per-type match counts, over
    text augmented with deterministic synthetic PII (the corpus itself
    is clean words — the injection, reproduced verbatim in the oracle
    SQL, makes every counter and replacement branch carry signal,
    including the zero-count rows). Map-only, JVM-side regex chain; the
    redacted text is compared by md5 so the driver row stays skinny."""
    from duckdb_vss_spark.pipeline.scrub import pii_counts, redact_pii

    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            d % 2 == 0,
            F.concat(F.lit(" contact admin"), d.cast("string"), F.lit("@mail.example.com")),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit(" see http://ex.example/d/"), d.cast("string")),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.concat(F.lit(" host 10.0."), (d % 200).cast("string"), F.lit(".1")),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.concat(F.lit(" call +1-555-0"), F.lpad((d % 1000).cast("string"), 3, "0")),
        ).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", aug.alias("t"))
    cnts = pii_counts("t")
    return base.select(
        "doc_id",
        F.md5(redact_pii("t")).alias("clean_fp"),
        *[c.alias(nm) for nm, c in cnts.items()],
    )


@register(
    "q_vocab_topk",
    """
    SELECT tok, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY freq DESC, tok LIMIT 50
    """,
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build (pipeline/corpus.py): token frequencies
    via one partial-agg shuffle (map-side combine ⇒ the exchange
    carries per-partition local vocabs, not token occurrences), global
    top-k via TakeOrderedAndProject — no full-vocabulary sort. Ties
    break (freq DESC, tok ASC) in both engines."""
    from duckdb_vss_spark.pipeline.corpus import vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    return vocab_topk(docs, "text", 50)


@register(
    "q_doc_oov_rate",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok FROM toks GROUP BY tok ORDER BY count(*) DESC, tok LIMIT 20
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS oov_rate
    FROM toks LEFT JOIN vocab v USING (tok)
    GROUP BY doc_id
    """,
)
def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV fraction vs the top-20 corpus vocabulary
    (pipeline/corpus.py): the vocabulary is broadcast (top-k small by
    construction), the rate is one skinny-keyed aggregation — tokenizer
    coverage analysis at scan cost."""
    from duckdb_vss_spark.pipeline.corpus import oov_rate, vocab_topk

    docs = load_table(spark, sf_dir, "documents")
    return oov_rate(docs, "text", "doc_id", vocab_topk(docs, "text", 20))


@register(
    "q_contamination",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS gm
      FROM words
    ),
    gh AS (
      SELECT doc_id, CAST(('0x' || substr(md5(gm), 1, 15)) AS BIGINT) AS gh FROM g
    ),
    ev AS (SELECT doc_id, gh FROM gh WHERE doc_id % 41 = 0),
    tr AS (SELECT doc_id AS train_id, gh FROM gh WHERE doc_id % 41 <> 0)
    SELECT ev.doc_id,
           CAST(count(DISTINCT ev.gh) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT tr.train_id) AS BIGINT) AS n_train_docs
    FROM ev JOIN tr ON ev.gh = tr.gh
    GROUP BY ev.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan (pipeline/contamination.py): eval
    split = doc_id % 41 = 0, word-4-gram inverted-index join on 60-bit
    md5-prefix keys (the shuffle never carries gram strings), per-eval-
    doc distinct shared grams + matching train docs. The GPT-3-style
    decontamination check as one bucketed join — no all-pairs scan."""
    from duckdb_vss_spark.pipeline.contamination import ngram_contamination

    docs = load_table(spark, sf_dir, "documents")
    return ngram_contamination(
        docs, "text", "doc_id", F.col("doc_id") % 41 == 0, n=4,
        # the 1/41 split is known-small: skip the auto gate's count job
        broadcast_eval=True,
    )


def _stratified_oracle() -> str:
    b = lambda f: int(f * float(2**60))
    return f"""
    SELECT doc_id, lang, source FROM documents
    WHERE CAST(('0x' || substr(md5('9_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      < CASE lang WHEN 'en' THEN {b(0.5)} WHEN 'de' THEN {b(0.05)} ELSE {b(0.15)} END
    """


@register("q_stratified_sample", _stratified_oracle())
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group deterministic sampling (pipeline/sample.
    stratified_hash_sample) — the data-mixing primitive: 50% of en, 5%
    of de, 15% of everything else, with the keep set a pure function of
    (seed, id, group threshold). Map-only (the mix compiles to one CASE
    expression against the 60-bit keyed hash); monotone in the
    fraction, so mix re-weights extend already-materialized subsets."""
    from duckdb_vss_spark.pipeline.sample import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.05},
        default_fraction=0.15, seed=9,
    ).select("doc_id", "lang", "source")


@register(
    "q_pack_sequences",
    """
    WITH laid AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('11_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS pos,
             CAST(CAST(('0x' || substr(md5('11_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT doc_id, shard, n_tok,
           CAST(COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
           CAST(COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS seq_id,
           CAST(COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos, doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 512 AS BIGINT) AS seq_pos
    FROM laid
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing (pipeline/pack.py): seeded
    global layout via the 60-bit keyed hash, running token offset per
    shard, 512-token sequence boundaries. One window over skinny
    (pos, n_tok) rows — each shard packs independently (the
    1000-executor export shape); deterministic on any engine or
    partitioning, reproduced bit-for-bit by the oracle window SQL."""
    from duckdb_vss_spark.pipeline.pack import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", budget=512, num_shards=8, seed=11).select(
        "doc_id", "shard", "n_tok", "offset", "seq_id", "seq_pos"
    )


@register(
    "q_kmv_distinct",
    """
    WITH words AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
    toks AS (
      SELECT lang,
             unnest(list_transform(range(1, greatest(len(w), 1)),
                    i -> w[i] || ' ' || w[i+1])) AS gm
      FROM words
    ),
    h AS (
      SELECT DISTINCT lang,
             CAST(('0x' || substr(md5('0_' || gm), 1, 15)) AS BIGINT) AS hv
      FROM toks
    ),
    rk AS (
      SELECT lang, hv, row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn FROM h
    ),
    s AS (
      SELECT lang, max(hv) AS hk, count(*) AS n_seen FROM rk WHERE rn <= 128 GROUP BY lang
    )
    SELECT lang,
           CASE WHEN n_seen < 128 THEN CAST(n_seen AS DOUBLE)
                ELSE CAST(n_seen - 1 AS DOUBLE) * CAST(1152921504606846976 AS DOUBLE)
                     / CAST(hk AS DOUBLE) END AS n_est,
           CAST(n_seen AS BIGINT) AS n_seen
    FROM s
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language distinct-bigram cardinality via the KMV sketch
    (pipeline/sketch.py): bottom-128 of the reproducible 60-bit hash,
    pruned to k per Arrow batch BEFORE the shuffle (the exchange never
    carries the distinct key set), merged per group, one-row estimate.
    Unlike HLL-based approx_count_distinct the estimate is a pure
    function of the distinct values, so the oracle reproduces it
    bit-for-bit — an oracle-checkable sketch."""
    from duckdb_vss_spark.pipeline.sketch import kmv_distinct
    from duckdb_vss_spark.pipeline.text import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select("lang", F.explode(word_ngrams("text", 2)).alias("gm"))
    return kmv_distinct(grams, "gm", k=128, group_cols=["lang"])


def _dedup_keep_oracle() -> str:
    pairs_sql = _simhash_pairs_oracle().strip()
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ),
    clusters AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)
    """


@register_extra("q_dedup_keep", _dedup_keep_oracle())
def q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's terminal step, end-to-end: simhash pairs →
    connected components → drop non-canonical members → surviving
    corpus (pipeline/dedup.dedup_keep). The drop-list anti-join carries
    ids only; payloads never shuffle."""
    from duckdb_vss_spark.pipeline.dedup import (
        dedup_clusters,
        dedup_keep,
        simhash_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs, "text", "doc_id", bits=16, max_hamming=3, blocks=2)
    keep = dedup_keep(docs, "doc_id", dedup_clusters(pairs))
    return keep.select("doc_id", "lang", "n_chars")


@register_extra(
    "q_stream_curation",
    """
    WITH good AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
      )
      WHERE (least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
             + CAST(len(list_distinct(w)) AS DOUBLE)
               / greatest(CAST(len(w) AS DOUBLE), 1.0)) / 2.0 >= 0.5
        AND CAST(('0x' || substr(md5('21_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            < CAST(0.6 * 1152921504606846976 AS BIGINT)
    )
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(min(doc_id) AS BIGINT) AS keep_id
    FROM good GROUP BY 1
    """,
)
def q_stream_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING curation front-end, oracle-checked through the sink:
    documents arrive as two micro-batches; the quality filter and the
    60%% hash sample are stateless in-row expressions fused into each
    batch, and exact dedup runs as the content-keyed
    ``applyInPandasWithState`` operator (streaming_dedup_first) whose
    per-fingerprint state spans batches — so the surviving (fp,
    keep_id) set equals the batch chain's min-id-per-fingerprint no
    matter how the stream is chopped. The keyed-state shape is what
    the batch aggregation can't give a stream: the first occurrence
    must win across ALL future batches, not within one."""
    import shutil
    import uuid

    from duckdb_vss_spark.pipeline.sample import hash_sample
    from duckdb_vss_spark.pipeline.text import fingerprint, quality_score
    from duckdb_vss_spark.streaming import streaming_dedup_first

    docs = load_table(spark, sf_dir, "documents")
    tag = uuid.uuid4().hex[:8]
    stage = f"/tmp/vss_scstage_{tag}"
    try:
        docs.repartition(2).write.parquet(stage)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        cur = hash_sample(
            stream.where(quality_score("text") >= F.lit(0.5)),
            "doc_id", 0.6, seed=21,
        ).select(fingerprint("text").alias("fp"), "doc_id")
        dedup = streaming_dedup_first(cur, "fp", "doc_id")
        sink = f"stream_curation_{tag}"
        q = (
            dedup.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.table(sink).select(
            "fp", F.col("keep_id").cast("bigint").alias("keep_id")
        )
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
    return out


def _curation_oracle() -> str:
    b = lambda f: int(f * float(2**60))
    h = lambda seed: (
        f"CAST(('0x' || substr(md5('{seed}_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    )
    return f"""
    WITH good AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents
      )
      WHERE (least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
             + CAST(len(list_distinct(w)) AS DOUBLE)
               / greatest(CAST(len(w) AS DOUBLE), 1.0)) / 2.0 >= 0.5
    ),
    keep AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM good)
      GROUP BY fp
    ),
    deduped AS (SELECT g.* FROM good g JOIN keep USING (doc_id)),
    sampled AS (
      SELECT doc_id, lang, text FROM deduped
      WHERE {h(11)} < CASE lang WHEN 'en' THEN {b(0.8)} ELSE {b(0.4)} END
    ),
    laid AS (
      SELECT doc_id, lang,
             {h(12)} AS pos,
             CAST({h(12)} % 8 AS INT) AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM sampled
    )
    SELECT doc_id, lang, n_tok, shard,
           CAST(COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
           CAST(COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512 AS BIGINT) AS seq_id,
           CAST(COALESCE(sum(n_tok) OVER (PARTITION BY shard ORDER BY pos, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) % 512 AS BIGINT) AS seq_pos
    FROM laid
    """


@register_extra("q_curation_e2e", _curation_oracle())
def q_curation_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation (pipeline/curate.curate_corpus): quality
    filter → exact dedup → stratified mix (en 80% / else 40%) →
    512-token packing, every stage a pure function of (seed, content),
    so the ENTIRE chain — survivor set, mix, layout offsets — replays
    in one SQL statement and hash-matches. Two shuffles end to end:
    the fingerprint aggregation (+ id-only semi join) and the packing
    window; the filter and mix fuse into the scans."""
    from duckdb_vss_spark.pipeline.curate import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    return curate_corpus(
        docs, "doc_id", "text", "lang",
        min_quality=0.5, fractions={"en": 0.8}, default_fraction=0.4,
        budget=512, num_shards=8, seed=11,
    )


@register_extra(
    "q_perplexity_filter",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(w), 1)),
                    i -> w[i] || ' ' || w[i+1])) AS b
      FROM words
    ),
    c12 AS (SELECT b, count(*) AS c FROM g GROUP BY b),
    c1 AS (
      SELECT string_split(b, ' ')[1] AS w1, sum(c) AS c1 FROM c12 GROUP BY 1
    ),
    voc AS (
      SELECT count(DISTINCT tok) AS v
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    scored AS (
      SELECT doc_id, count(*) AS nb,
             sum(ln((c + 1.0) / (c1 + v))) / count(*) AS s
      FROM g
      JOIN c12 USING (b)
      JOIN c1 ON string_split(g.b, ' ')[1] = c1.w1
      CROSS JOIN voc
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams FROM (
      SELECT doc_id, nb,
             row_number() OVER (ORDER BY round(s, 6) ASC, doc_id ASC) AS rn
      FROM scored
    ) WHERE rn <= 100
    """,
)
def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filtering (pipeline/lm.py): the 100 documents least
    probable under the corpus's own add-one bigram LM — the CCNet /
    Gopher quality cut, model-free. All-JVM plan: bigram counts
    (map-side partials), prefix rollup, skinny-key joins, one per-doc
    aggregation. The oracle compares the selected IDS: ln is the one
    non-IEEE-exact op, so the rank key rounds scores to 6 decimals
    (gaps ~1e-5 vs cross-engine drift ~1e-11) with id tie-breaks —
    exact duplicates tie exactly instead of by float noise."""
    from duckdb_vss_spark.pipeline.lm import perplexity_filter

    docs = load_table(spark, sf_dir, "documents")
    return perplexity_filter(docs, "text", "doc_id", worst=100)


@register_extra(
    "q_random_projection",
    """
    WITH idx AS (SELECT i, j FROM range(64) t1(i), range(8) t2(j)),
    signs AS (
      SELECT i, j,
             CASE WHEN strpos('02468ace',
                    substr(md5('rp_5_' || CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1)) > 0
                  THEN 1.0 ELSE -1.0 END AS s
      FROM idx
    ),
    smat AS (SELECT j, list(s ORDER BY i) AS sv FROM signs GROUP BY j),
    e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL
    )
    SELECT vec_id, CAST(j AS INT) AS pos,
           list_inner_product(v, sv) * (1.0 / sqrt(8.0)) AS val
    FROM e, smat
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projection (pipeline/corpus.
    random_projection): 64 -> 8 dims via the seeded +/-1 sign matrix.
    Both engines derive the matrix from the same md5 nibble parity —
    pure function of (seed, i, j), no fitted state — and each output
    coordinate is the pinned sequential-fold inner product, so the
    projected vectors match bit-for-bit. Map-only, no shuffle: the
    scan-width lever ahead of the IVF/PQ/SQ ladder. Output shape is
    one SCALAR row per (vec_id, pos) — the driver's canonicalizer
    cannot hash array cells (VERDICT r9 #1), so the projected vector
    is posexploded here and the oracle skips its list() rollup."""
    from duckdb_vss_spark.pipeline.corpus import random_projection

    emb = load_table(spark, sf_dir, "embeddings")
    proj = random_projection(emb, "embedding", 8, seed=5)
    return proj.select("vec_id", F.posexplode("proj").alias("pos", "val"))


def _pca_power_oracle(dims: int = 64, iters: int = 3, qg: str = "1000000.0", qv: int = 8192) -> str:
    """DuckDB replay of pipeline/pca.py, stage by stage: the quantized
    Gram matrix (integer sums of floor(e_i·e_j·Qg + 0.5) — associative,
    partitioning-independent), ``iters`` unrolled power iterations in
    pure BIGINT arithmetic (DuckDB's truncating ``//``, which the Spark
    side's Python-int ``_tdiv`` mirrors; no norm, no sqrt, no float
    division anywhere), and the integer dot-product scoring. Scores are
    a pure function of (data, Qg, Qv, iters), so this oracle is STRICT:
    any divergence in any iteration changes the BIGINT output."""
    steps = []
    prev = "v0"
    for t in range(1, iters + 1):
        steps.append(f"""
    w{t} AS (
      SELECT c.i AS i, SUM(c.s * p.v) AS w
      FROM cells c JOIN {prev} p ON p.i = c.j GROUP BY c.i
    ),
    s{t} AS (SELECT MAX(ABS(w)) // {qv} + 1 AS sc FROM w{t}),
    v{t} AS (SELECT w{t}.i AS i, w{t}.w // s{t}.sc AS v FROM w{t}, s{t})""")
        prev = f"v{t}"
    return f"""
    WITH x AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE embedding IS NOT NULL
    ),
    idx AS (SELECT UNNEST(range(1, {dims + 1})) AS i),
    cells AS (
      SELECT a.i AS i, b.i AS j,
             SUM(CAST(FLOOR(x.e[a.i] * x.e[b.i] * {qg} + 0.5) AS BIGINT)) AS s
      FROM x, idx a, idx b
      GROUP BY a.i, b.i
    ),
    v0 AS (SELECT i, CAST({qv} AS BIGINT) AS v FROM idx),{",".join(steps)}
    SELECT x.vec_id AS vec_id,
           -- SUM(BIGINT) is HUGEINT in DuckDB (pandas would float it)
           CAST(SUM(CAST(FLOOR(x.e[t.i] * {qg} + 0.5) AS BIGINT) * f.v) AS BIGINT) AS pc1
    FROM x, idx t JOIN v{iters} f ON f.i = t.i
    GROUP BY x.vec_id
    """


@register_extra("q_pca_power", _pca_power_oracle())
def q_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-principal-component score per embedding
    (pipeline/pca.py): integer-quantized Gram matrix (one Arrow map
    pass + a d²-row skinny reduce — vectors never leave executors),
    integer power iteration on the driver, map-only int-dot scoring.
    The kmeans bit-exactness trick extended to an iterative
    eigensolver: every stage is integer arithmetic after a pinned
    IEEE quantization, so the oracle replays ALL of it exactly —
    an oracle-checked iterative linear-algebra query, not a
    rows-only check."""
    from duckdb_vss_spark.pipeline.pca import pca_power_scores

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_power_scores(emb, "embedding", "vec_id", dims=64)


def _kmeans_oracle(k: int = 4, iters: int = 2, seed: int = 5) -> str:
    """DuckDB replay of pipeline/kmeans.py, iteration by iteration:
    seeded hash init, list_distance argmin assignment (ties → lower
    cid), and the integer-quantized update sum(CAST(floor(v·1e9+0.5)
    AS BIGINT))/n/1e9 — the form both engines compute bit-identically
    (double→DECIMAL casts are NOT portable: Spark rounds half-up,
    DuckDB half-even; floor of an identical IEEE double is)."""

    def asgn(cents_cte: str) -> str:
        return f"""SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               row_number() OVER (
                 PARTITION BY e.vec_id ORDER BY list_distance(e.v, c.c), c.cid
               ) AS rn
        FROM e, {cents_cte} c) WHERE rn = 1"""

    parts = [
        f"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE embedding IS NOT NULL
    ),
    c0 AS (
      SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS INT) AS cid, v AS c
      FROM (
        SELECT vec_id, v,
               CAST(('0x' || substr(md5('{seed}_' || CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM e ORDER BY h, vec_id LIMIT {k}
      )
    )"""
    ]
    for t in range(1, iters + 1):
        parts.append(f"a{t} AS ({asgn(f'c{t-1}')})")
        parts.append(
            f"""s{t} AS (
      SELECT cid, p, sum(CAST(floor(val * 1000000000.0 + 0.5) AS BIGINT)) AS s,
             count(*) AS n
      FROM (SELECT cid, unnest(v) AS val, generate_subscripts(v, 1) AS p FROM a{t})
      GROUP BY 1, 2
    )"""
        )
        parts.append(
            f"""c{t} AS (
      SELECT i.cid, COALESCE(u.c, i.c) AS c
      FROM c{t-1} i LEFT JOIN (
        SELECT cid, list(CAST(s AS DOUBLE) / n / 1000000000.0 ORDER BY p) AS c
        FROM s{t} GROUP BY cid
      ) u ON i.cid = u.cid
    )"""
        )
    parts.append(f"af AS ({asgn(f'c{iters}')})")
    parts.append("cnt AS (SELECT cid, count(*) AS n FROM af GROUP BY 1)")
    # Scalar output shape (VERDICT r9 #1): one row per centroid
    # coordinate — generate_subscripts is 1-based, posexplode 0-based.
    return (
        ",\n    ".join(parts)
        + f"""
    SELECT c.cid AS cluster_id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n,
           CAST(u.p - 1 AS INT) AS pos, u.val
    FROM c{iters} c
    LEFT JOIN cnt ON c.cid = cnt.cid
    JOIN (SELECT cid, unnest(c) AS val, generate_subscripts(c, 1) AS p
          FROM c{iters}) u ON u.cid = c.cid
    """
    )


@register_extra("q_kmeans", _kmeans_oracle())
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (pipeline/kmeans.py): 2 Lloyd iterations,
    k=4, seeded-hash init — every iteration's assignments and centroid
    means are BIT-IDENTICAL across engines (integer-quantized update
    sums; no float-order or decimal-rounding dependence), so this
    oracle-checks an iterative algorithm exactly, not just its row
    counts. Spark cost shape: iters map-only assignment scans + iters
    skinny (cluster, dim) shuffles; driver holds k×d doubles only.
    Output shape is one SCALAR row per (cluster_id, pos) centroid
    coordinate (VERDICT r9 #1: the driver canonicalizer cannot hash
    array cells, so the centroid array is posexploded here and the
    oracle unnests with generate_subscripts)."""
    from duckdb_vss_spark.pipeline.kmeans import kmeans_summary

    emb = load_table(spark, sf_dir, "embeddings")
    summ = kmeans_summary(emb, "embedding", "vec_id", k=4, iters=2, seed=5)
    return summ.select(
        "cluster_id", "n", F.posexplode("centroid").alias("pos", "val")
    )


@register_extra(
    "q_knn_classify",
    """
    WITH q AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id % 10 = 0),
    r AS (SELECT vec_id AS rid, label, embedding FROM embeddings WHERE vec_id % 10 <> 0),
    nn AS (
      SELECT qid, label FROM (
        SELECT q.qid, r.label,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]),
                                        CAST(r.embedding AS DOUBLE[])), r.rid
               ) AS rn
        FROM q, r
      ) WHERE rn <= 5
    ),
    votes AS (SELECT qid, label, count(*) AS votes FROM nn GROUP BY 1, 2)
    SELECT qid, label, votes FROM (
      SELECT qid, label, CAST(votes AS BIGINT) AS votes,
             row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label ASC) AS rn
      FROM votes
    ) WHERE rn = 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote kNN classification (operators/join.knn_classify):
    embedding-space label propagation — every 10th vector is treated as
    unlabeled and takes the modal label of its 5 nearest labeled
    neighbors (vote ties → smaller label, distance ties → smaller id).
    Brute-force candidates here for oracle exactness; at corpus scale
    the identical vote aggregation runs over HNSW/IVF candidates."""
    from duckdb_vss_spark.operators.join import knn_classify

    emb = load_table(spark, sf_dir, "embeddings")
    # broadcast strategy: the Arrow/BLAS batched kernel, ~5x the
    # interpreted-HOF crossjoin at sf0.1 (CI pins both strategies
    # value-identical: test_knn_classify_broadcast_strategy_*)
    return knn_classify(
        emb.where(F.col("vec_id") % 10 == 0),
        emb.where(F.col("vec_id") % 10 != 0),
        "embedding", "embedding", "label", k=5, metric="l2sq",
        strategy="broadcast",
    )


@register_extra(
    "q_weighted_sample",
    """
    WITH keyed AS (
      SELECT doc_id, lang,
             round(ln((CAST(('0x' || substr(md5('7_' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1)
                      / 1152921504606846976.0)
                   / CAST(n_chars AS DOUBLE), 12) AS wk
      FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
    )
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY wk DESC, doc_id ASC) AS rn
      FROM keyed
    ) WHERE rn <= 20
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (pipeline/sample.
    weighted_sample, Efraimidis-Spirakis A-Res): 20 docs per language
    with inclusion probability ∝ n_chars, as a pure function of
    (seed, ids, weights) — reproducible on any engine/partitioning.
    One map pass + one rank window (map-side WindowGroupLimit); the
    ln-key is rounded to 12 decimals so ordering never hinges on
    sub-ULP libm differences between engines."""
    from duckdb_vss_spark.pipeline.sample import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(
        docs, "doc_id", F.col("n_chars"), k=20, seed=7, group_col="lang"
    ).select("doc_id", "lang")


@register_extra(
    "q_corpus_diff",
    """
    WITH old AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fo
      FROM documents WHERE doc_id % 7 <> 0
    ),
    new AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(
               CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END
             ), '\\s+', ' ', 'g'))) AS fn
      FROM documents WHERE doc_id % 11 <> 0
    )
    SELECT COALESCE(old.doc_id, new.doc_id) AS id,
           CASE WHEN old.doc_id IS NULL THEN 'added'
                WHEN new.doc_id IS NULL THEN 'removed'
                WHEN fo IS DISTINCT FROM fn THEN 'changed' END AS status
    FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
    WHERE (old.doc_id IS NULL) OR (new.doc_id IS NULL)
       OR (fo IS DISTINCT FROM fn)
    """,
)
def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (pipeline/corpus.corpus_diff): the driver
    of incremental processing — (id, added|removed|changed) between two
    versions, unchanged bulk omitted. Both sides collapse to (id,
    fingerprint) before the full outer join, so the shuffle is two
    skinny columns and payloads never move. Here snapshot A drops
    doc_id%7=0, snapshot B drops %11=0 and edits %13=0 — exercising
    all three states against the SQL mirror."""
    from duckdb_vss_spark.pipeline.corpus import corpus_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.where(F.col("doc_id") % 7 != 0)
    new = docs.where(F.col("doc_id") % 11 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return corpus_diff(old, new, "doc_id", "text")


def _dedup_keep_best_oracle() -> str:
    pairs_sql = _simhash_pairs_oracle().strip()
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, lab) AS (
      SELECT id, id FROM nodes
      UNION
      SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ),
    clusters AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id),
    scored AS (
      SELECT doc_id,
             (least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
              + CAST(len(list_distinct(w)) AS DOUBLE)
                / greatest(CAST(len(w) AS DOUBLE), 1.0)) / 2.0 AS qs
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    ),
    ranked AS (
      SELECT c.id,
             row_number() OVER (
               PARTITION BY c.cluster_id ORDER BY s.qs DESC, c.id ASC
             ) AS rn
      FROM clusters c JOIN scored s ON s.doc_id = c.id
    )
    SELECT doc_id, lang, n_chars FROM documents
    WHERE doc_id NOT IN (SELECT id FROM ranked WHERE rn > 1)
    """


@register_extra("q_dedup_keep_best", _dedup_keep_best_oracle())
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted dedup resolution (pipeline/dedup.
    dedup_keep_best): each near-dup cluster keeps its HIGHEST-quality
    member (length/diversity score, ties → min id) rather than the
    min-id canonical — near-dups differ in quality (truncated copies,
    boilerplate mirrors) and a quality-blind canonical discards the
    best variant. The ranking window runs per cluster (near-dup-mass
    sized); the drop-list anti-join carries ids only. The score doubles
    are bit-equal cross-engine (q_quality_score is hash-green), so the
    ordering — and therefore the survivor set — matches exactly."""
    from duckdb_vss_spark.pipeline.dedup import (
        dedup_clusters,
        dedup_keep_best,
        simhash_pairs,
    )
    from duckdb_vss_spark.pipeline.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_pairs(docs, "text", "doc_id", bits=16, max_hamming=3, blocks=2)
    keep = dedup_keep_best(
        docs, "doc_id", dedup_clusters(pairs), quality_score("text")
    )
    return keep.select("doc_id", "lang", "n_chars")


# --------------------------------------------------------------------------
# round 6b: chunking + per-source caps
# --------------------------------------------------------------------------

@register(
    "q_chunk_docs",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      FROM documents
    ),
    k AS (
      SELECT doc_id, toks, n,
             greatest(CAST(0 AS BIGINT),
                      CAST(ceil((n - 32) / 24.0) AS BIGINT)) AS last_chunk
      FROM t
    )
    SELECT doc_id,
           i AS chunk_id,
           least(CAST(32 AS BIGINT), n - i * 24) AS n_tokens,
           array_to_string(list_slice(toks, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text
    FROM k, UNNEST(generate_series(CAST(0 AS BIGINT), last_chunk)) AS u(i)
    ORDER BY doc_id, chunk_id
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking (pipeline/chunk.py): 32-token
    sliding windows with 8-token overlap, exploded map-only — zero
    shuffles, zero Python; the oracle recomputes the identical window
    layout with list_slice/generate_series."""
    from duckdb_vss_spark.pipeline.chunk import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "text", "doc_id", chunk_tokens=32, overlap=8
    ).orderBy("doc_id", "chunk_id")


@register(
    "q_source_cap",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY CAST('0x' || substr(md5('7_' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
                        doc_id
             ) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM ranked WHERE rn <= 10
    GROUP BY source ORDER BY source
    """,
)
def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (pipeline/sample.source_cap): at most 10
    docs per source survive, chosen by the engine-reproducible 60-bit
    hash ranking — Spark plans the rank filter as a map-side
    WindowGroupLimit (each task pre-prunes to 10/group pre-shuffle).
    The oracle recomputes the identical ranking; id_sum pins WHICH
    rows were kept, not just how many."""
    from duckdb_vss_spark.pipeline.sample import source_cap

    docs = load_table(spark, sf_dir, "documents")
    kept = source_cap(docs, "doc_id", "source", cap=10, seed=7)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("source")
    )


@register(
    "q_bm25_topk",
    bm25_oracle_sql(
        "documents", "text", "doc_id", ["join", "window", "hash"], topk=15
    ),
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (pipeline/bm25.py) — the lexical half of
    hybrid search: top-15 documents for a 3-term query, scored with
    the public Okapi BM25 formula. Integer statistics are exact;
    per-term partial scores round through DECIMAL(18,6) before the
    per-doc sum so partial-agg order cannot perturb the hash. The
    oracle is the same dataflow generated as SQL (bm25_oracle_sql)."""
    from duckdb_vss_spark.pipeline.bm25 import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(
        docs, "text", "doc_id", ["join", "window", "hash"], topk=15
    )


@register(
    "q_semdedup",
    semdedup_oracle_sql(
        "embeddings", "embedding", "vec_id", seeded_centroids(8, 64, seed=11), 0.4
    ),
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (pipeline/semdedup.py, after arXiv:2303.09540):
    embedding-space clustering bounds the near-dup search to
    within-cluster pairs — map-only JVM centroid assignment
    (array_min over (distance, cid) structs, no UDF/shuffle), one
    self-join keyed by cluster_id, exact cosine on candidates only.
    The oracle inlines the identical seeded centroids and recomputes
    assignment + pair scores bit-for-bit."""
    from duckdb_vss_spark.pipeline.semdedup import (
        seeded_centroids,
        semdedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    C = seeded_centroids(8, 64, seed=11)
    return semdedup_pairs(emb, "embedding", "vec_id", C, threshold=0.4).orderBy(
        "id_a", "id_b"
    )


def _hybrid_rrf_oracle() -> str:
    lex_ctes = bm25_oracle_ctes(
        "lex_scored", "documents", "text", "doc_id",
        ["join", "window", "hash"], topk=50,
    )
    qvec = "(SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 5)"
    return f"""
    WITH {lex_ctes},
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM lex_scored
    ),
    vec AS (
      SELECT vec_id AS doc_id,
             row_number() OVER (
               ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]), {qvec}),
                        vec_id
             ) AS rank
      FROM embeddings WHERE embedding IS NOT NULL
      QUALIFY rank <= 50
    ),
    u AS (
      SELECT doc_id, CAST(CAST(1.0 AS DOUBLE) / (60 + rank) AS DECIMAL(18,12)) AS c FROM lex
      UNION ALL
      SELECT doc_id, CAST(CAST(1.0 AS DOUBLE) / (60 + rank) AS DECIMAL(18,12)) AS c FROM vec
    )
    SELECT doc_id, CAST(sum(c) AS DOUBLE) AS rrf_score
    FROM u GROUP BY doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT 10
    """


@register("q_hybrid_rrf", _hybrid_rrf_oracle())
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the engine's two halves fused: BM25 top-50
    (lexical) + cosine top-50 (vector) combined with Reciprocal Rank
    Fusion (operators/fuse.py, SIGIR'09). Both legs are top-n small
    before fusion, so the fuse is a skinny union + one groupBy; the
    DECIMAL-rounded contributions make the sum order-independent. The
    oracle recomputes both legs and the fusion in SQL."""
    from duckdb_vss_spark.operators.fuse import add_rank, rrf_fuse
    from duckdb_vss_spark.pipeline.bm25 import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    from duckdb_vss_spark.operators.topk import knn_search
    from duckdb_vss_spark.queries import _query_vec

    qv = _query_vec(spark, sf_dir, 5)
    lex = bm25_scores(docs, "text", "doc_id", ["join", "window", "hash"], topk=50)
    lex = add_rank(lex, "doc_id", F.desc("score"), F.asc("doc_id"))
    vec = knn_search(
        emb.select("vec_id", "embedding"), "embedding", qv, 50, metric="cosine"
    ).select(F.col("vec_id").alias("doc_id"), "dist")
    vec = add_rank(vec, "doc_id", F.asc("dist"), F.asc("doc_id"))
    return rrf_fuse(
        [lex.select("doc_id", "rank"), vec.select("doc_id", "rank")],
        "doc_id",
        k=60,
        topk=10,
    )


@register(
    "q_mix_budget",
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST('0x' || substr(md5('13_' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tok
      FROM t
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM c
    WHERE cum_tok <= CASE source WHEN 'src1' THEN 1500
                                 WHEN 'src2' THEN 700
                                 ELSE 300 END
    GROUP BY source ORDER BY source
    """,
)
def q_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing (pipeline/mix.py): each source
    contributes docs by hash priority until its token budget is hit
    (src1: 1500 tokens, src2: 700, others: 300) — the primitive LLM
    data recipes are written in. id_sum pins the exact kept set; the
    oracle recomputes the identical hash-ordered running sum."""
    from duckdb_vss_spark.pipeline.mix import mix_by_token_budget

    docs = load_table(spark, sf_dir, "documents")
    kept = mix_by_token_budget(
        docs, "text", "doc_id", "source",
        budgets={"src1": 1500, "src2": 700}, default_budget=300, seed=13,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .orderBy("source")
    )


@register(
    "q_temperature_mix",
    """
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST('0x' || substr(md5('17_' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(floor(sqrt(CAST(sum(n_tok) AS DOUBLE)) * 1048576) AS BIGINT) AS w
      FROM t GROUP BY source
    ),
    b AS (
      SELECT source,
             CAST((CAST(5000 AS HUGEINT) * w) // (SELECT sum(w) FROM s) AS BIGINT) AS budget
      FROM s
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum_tok
      FROM t
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS tokens,
           CAST(sum(doc_id) AS BIGINT) AS id_sum,
           CAST(max(b.budget) AS BIGINT) AS budget
    FROM c JOIN b ON c.source = b.source
    WHERE cum_tok <= b.budget
    GROUP BY c.source ORDER BY c.source
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted data mixing (pipeline/mix.temperature_mix):
    per-source token budgets derived as total·n_s^0.5/Σn^0.5 — the
    GPT-3-style size^alpha mixture rule with alpha a temperature that
    upweights small sources — then the deterministic hash-priority
    running-sum selection. The derivation is engine-exact (IEEE sqrt +
    integer quantization + integer floor-division), so the ORACLE
    RE-DERIVES the budgets itself in SQL; the budget column in the
    output hash-pins the derivation, id_sum pins the exact kept set."""
    from duckdb_vss_spark.pipeline.mix import mix_by_token_budget, temperature_budgets

    docs = load_table(spark, sf_dir, "documents")
    budgets = temperature_budgets(docs, "text", "source", 5000, alpha=0.5)
    kept = mix_by_token_budget(
        docs, "text", "doc_id", "source", budgets, default_budget=0, seed=17
    )
    bexpr = F.lit(None).cast("bigint")
    for g, bval in sorted(budgets.items()):
        bexpr = F.when(F.col("source") == g, F.lit(int(bval)).cast("bigint")).otherwise(bexpr)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens"),
            F.sum("doc_id").cast("bigint").alias("id_sum"),
        )
        .withColumn("budget", bexpr)
        .orderBy("source")
    )


@register(
    "q_dup_spans",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    g AS (
      SELECT doc_id, i AS span_start,
             CAST('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + 10), ' ')), 1, 15) AS BIGINT) AS gh
      FROM t, UNNEST(generate_series(0, n - 10)) AS u(i)
      WHERE n >= 10
    ),
    rep AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT doc_id, span_start FROM g JOIN rep USING (gh)),
    isl AS (
      SELECT doc_id, span_start,
             span_start - row_number() OVER (PARTITION BY doc_id ORDER BY span_start) AS grp
      FROM h
    )
    SELECT doc_id, CAST(min(span_start) AS BIGINT) AS span_start,
           CAST(count(*) + 9 AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_id, grp
    ORDER BY doc_id, span_start
    """,
)
def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (pipeline/spandedup.py, after Lee et
    al. arXiv:2107.06499): maximal token runs >= 10 tokens repeated
    across documents, located by position — the span-level complement
    to the doc-level near-dup family. Positioned 10-grams (map-only,
    JVM md5) -> repeated-gram keys (one 8-byte-key shuffle) -> join
    back -> gaps-and-islands merge. The oracle reproduces the same
    relational dataflow."""
    from duckdb_vss_spark.pipeline.spandedup import duplicate_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_spans(docs, "text", "doc_id", width=10).orderBy(
        "doc_id", "span_start"
    )


@register(
    "q_stream_interval_join",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
         r AS (SELECT * FROM events WHERE event_type = 'error')
    SELECT l.event_id AS click_id, r.event_id AS err_id, l.user_id AS user_id
    FROM l JOIN r
      ON l.user_id = r.user_id
     AND r.ts BETWEEN l.ts - INTERVAL 120 MINUTE AND l.ts
    ORDER BY click_id, err_id
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, oracle-checked: the watermarked
    time-range join (streaming/ops.stream_interval_join) runs as a REAL
    Structured Streaming query (file sources, availableNow trigger,
    append mode to a memory sink) and its pair multiset must equal the
    batch inequality join DuckDB runs. Watermark + range bound are what
    let join state GC — the property an unbounded stream needs."""
    import uuid

    from duckdb_vss_spark.streaming import read_events_stream, stream_interval_join

    clicks = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "click"
    )
    errors = read_events_stream(spark, sf_dir).where(
        F.col("event_type") == "error"
    )
    pairs = stream_interval_join(clicks, errors, lookback="120 minutes")
    sink = f"stream_ij_{uuid.uuid4().hex[:8]}"
    q = (
        pairs.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).orderBy("click_id", "err_id")


@register(
    "q_image_phash_dedup",
    """
    WITH m AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(CASE WHEN (a.doc_id % 20 = 10) = (b.doc_id % 20 = 10)
                     THEN 0 ELSE 2 END AS INT) AS hamming
    FROM m a JOIN m b
      ON a.doc_id % 4 = b.doc_id % 4 AND a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup, end-to-end on REAL pixels: PNGs are
    synthesized by construction (8x8-cell checkerboard patterns, 2x2
    pixels per cell; pattern = doc_id % 4 with one row inverted per
    pattern so cross-pattern hamming is 16; docs with doc_id % 20 = 10
    carry two inverted noise cells), encoded with the repo's own PNG
    codec, DECODED back (pipeline/imagehash.ahash_images), aHashed, and
    paired via the banded hamming join (pipeline/imagehash.ahash_pairs,
    pigeonhole-exact recall). The oracle derives the expected pairs and
    exact hammings (0 within the clean/noisy class, 2 across) from the
    construction — pinning decode, hashing, banding and verification in
    one value-checked query."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from duckdb_vss_spark.pipeline.imagehash import ahash_images, ahash_pairs

    def _synth(doc_id):
        from duckdb_vss_spark.pipeline.png import encode_png

        out = []
        for d in doc_id:
            d = int(d)
            cells = (np.indices((8, 8)).sum(axis=0) % 2).astype(bool)
            cells[2 * (d % 4), :] = ~cells[2 * (d % 4), :]
            if d % 20 == 10:
                cells[0, 1] = ~cells[0, 1]
                cells[7, 6] = ~cells[7, 6]
            img = np.where(cells, 255, 0).astype(np.uint8)
            img = np.repeat(np.repeat(img, 2, axis=0), 2, axis=1)  # 16x16
            out.append(encode_png(img))
        return pd.Series(out)

    synth = pandas_udf(_synth, BinaryType())
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )
    imgs = docs.withColumn("payload", synth(F.col("doc_id")))
    hashes = ahash_images(imgs, "payload", "doc_id")
    return ahash_pairs(hashes, "doc_id", max_hamming=3, blocks=4).orderBy(
        "id_a", "id_b"
    )


@register_extra(
    "q_dup_coverage",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    g AS (
      SELECT doc_id, i AS span_start,
             CAST('0x' || substr(md5(array_to_string(list_slice(toks, i + 1, i + 10), ' ')), 1, 15) AS BIGINT) AS gh
      FROM t, UNNEST(generate_series(0, n - 10)) AS u(i)
      WHERE n >= 10
    ),
    rep AS (SELECT gh FROM g GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
    h AS (SELECT doc_id, span_start FROM g JOIN rep USING (gh)),
    isl AS (
      SELECT doc_id, span_start,
             span_start - row_number() OVER (PARTITION BY doc_id ORDER BY span_start) AS grp
      FROM h
    ),
    spans AS (
      SELECT doc_id, CAST(count(*) + 9 AS BIGINT) AS span_tokens
      FROM isl GROUP BY doc_id, grp
    )
    SELECT t.doc_id,
           CAST(coalesce(sum(spans.span_tokens), 0) AS BIGINT) AS dup_tokens,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(spans.span_tokens), 0) AS DOUBLE) / t.n AS dup_frac
    FROM t LEFT JOIN spans USING (doc_id)
    WHERE t.n > 0
    GROUP BY t.doc_id, t.n
    ORDER BY doc_id
    """,
)
def q_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-text coverage: the fraction of each doc's
    tokens inside a cross-document repeated span (duplicate_spans
    output joined back to token counts) — the quality signal span-level
    dedup exists to produce (drop or trim docs above a dup_frac
    threshold). Exact integer token accounting; one extra keyed agg on
    top of the span operator."""
    from duckdb_vss_spark.pipeline.spandedup import duplicate_spans
    from duckdb_vss_spark.pipeline.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    spans = duplicate_spans(docs, "text", "doc_id", width=10)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").cast("bigint").alias("dup_tokens")
    )
    base = docs.select("doc_id", token_count("text").alias("n_tokens")).where(
        F.col("n_tokens") > 0
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("bigint").alias(
                "dup_tokens"
            ),
            F.col("n_tokens").cast("bigint"),
            (
                F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                / F.col("n_tokens")
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def _profile_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    parts = [
        f"""
        SELECT '{c}' AS col_name,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) - count({c}) AS BIGINT) AS n_null,
               CAST(count(DISTINCT CAST({c} AS DOUBLE)) AS BIGINT) AS n_distinct,
               min(CAST({c} AS DOUBLE)) AS min_v,
               max(CAST({c} AS DOUBLE)) AS max_v,
               CAST(sum(CAST(CAST({c} AS DOUBLE) AS DECIMAL(28,4))) AS DOUBLE) AS sum_v
        FROM lineitem"""
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


@register_extra("q_profile_lineitem", _profile_oracle())
def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass numeric profiling (pipeline/profile.py): stack-unpivot
    then a single grouped aggregate computes count/null/distinct/range/
    sum for every column over ONE scan — vs the oracle's k-scan UNION.
    The data-quality pass run before training on any new source."""
    from duckdb_vss_spark.pipeline.profile import profile_numeric

    li = load_table(spark, sf_dir, "lineitem")
    return profile_numeric(li, ["l_quantity", "l_extendedprice", "l_discount"])


@register_extra(
    "q_stream_join_window",
    """
    WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
         r AS (SELECT * FROM events WHERE event_type = 'error'),
         j AS (
           SELECT l.ts AS l_ts
           FROM l JOIN r
             ON l.user_id = r.user_id
            AND r.ts BETWEEN l.ts - INTERVAL 120 MINUTE AND l.ts
         ),
         wm AS (
           -- the final watermark the WINDOW operator sees: the join
           -- holds the left event-time watermark back by the range
           -- bound (a right row up to 120 min in the future can still
           -- match an l_ts), so w = min(max_l, max_r - 120 min); append
           -- mode emits exactly the windows that CLOSED under it
           SELECT least(
             (SELECT max(epoch_us(ts)) FROM l),
             (SELECT max(epoch_us(ts)) - 7200000000 FROM r)
           ) AS w
         )
    SELECT CAST(epoch_us(l_ts) - (epoch_us(l_ts) % 1800000000) AS BIGINT)
             AS window_start_us,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM j GROUP BY 1
    HAVING window_start_us + 1800000000 <= (SELECT w FROM wm)
    ORDER BY 1
    """,
)
def q_stream_join_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained stateful streaming — a stream-stream interval join FED
    INTO a watermarked tumbling-window aggregate in ONE streaming
    query (Spark's multiple-stateful-operator append pipeline; the
    join's watermark propagates so the window can finalize). The
    oracle recomputes the join + 30-minute windows in batch SQL."""
    import uuid

    from duckdb_vss_spark.streaming import read_events_stream, stream_interval_join

    clicks = read_events_stream(spark, sf_dir).where(F.col("event_type") == "click")
    errors = read_events_stream(spark, sf_dir).where(F.col("event_type") == "error")
    pairs = stream_interval_join(
        clicks, errors, lookback="120 minutes", watermark="0 seconds",
        keep_ts=True,
    )
    agg = pairs.groupBy(F.window("l_ts", "30 minutes")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    sink = f"stream_jw_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.table(sink)
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "n_pairs",
        )
        .orderBy("window_start_us")
    )


@register_extra(
    "q_stream_static_join",
    """
    SELECT CAST(epoch_us(ts) - (epoch_us(ts) % 900000000) AS BIGINT) AS window_start_us,
           c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, oracle-checked: the event stream
    is joined per micro-batch to the STATIC customer dim (broadcast,
    stateless — no join state, no dim watermark) and fed into a
    watermarked 15-minute windowed aggregate per market segment; the
    complete-mode result must agree with the batch join+group-by SQL.
    Completes the streaming-join matrix: stream-stream interval join
    (q_stream_interval_join) + stream-static dimension join (this)."""
    import uuid

    from duckdb_vss_spark.sources import load_table
    from duckdb_vss_spark.streaming import read_events_stream, stream_static_enrich

    ev = read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = stream_static_enrich(ev, dim, "user_id", "c_custkey", window="15 minutes")
    sink = f"stream_static_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(sink).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "c_mktsegment",
        F.col("n").cast("long").alias("n"),
        F.col("sum_value"),
    )


@register_extra(
    "q_stream_matview",
    """
    SELECT CAST(epoch_us(ts) - (epoch_us(ts) % 900000000) AS BIGINT) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MATERIALIZED VIEW, oracle-checked end-to-end through
    the SINK: the windowed aggregate runs in UPDATE mode, each
    micro-batch's changed groups are merge-upserted by key into a
    plain parquet table (anti-join + union + atomic rename), and the
    oracle comparison reads THE TABLE — so what is verified is the
    maintained materialized view itself, not a memory-sink echo. The
    incremental-view-maintenance pattern for 100 TB/day: per-batch
    work is changed-groups-sized, never a stream recompute."""
    import shutil
    import uuid

    from duckdb_vss_spark.streaming import read_events_stream, streaming_matview, windowed_event_counts

    tag = uuid.uuid4().hex[:8]
    path = f"/tmp/vss_matview_{tag}"
    ckpt = f"/tmp/vss_matview_ckpt_{tag}"
    ev = read_events_stream(spark, sf_dir)
    agg = windowed_event_counts(ev, window="15 minutes", exact_sum=True).select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        "sum_value",
    )
    q = streaming_matview(agg, path, ["window_start_us", "event_type"], ckpt)
    q.awaitTermination(180)
    out = spark.read.parquet(path).cache()
    out.count()
    shutil.rmtree(ckpt, ignore_errors=True)
    shutil.rmtree(path, ignore_errors=True)  # cached above; no /tmp garbage
    return out


@register(
    "q_stream_matview_restart",
    """
    SELECT CAST(epoch_us(ts) - (epoch_us(ts) % 900000000) AS BIGINT) AS window_start_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_matview_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESTART-INCREMENT property of the streaming materialized
    view, under the hard oracle gate (VERDICT r6 #10): events arrive in
    two time-ordered halves; the matview query consumes the first half
    (availableNow) and STOPS; the second half lands in the staging dir
    and a NEW query starts from the SAME checkpoint. The maintained
    table must equal the all-data aggregate — which pins (a) state
    restore across restart (straddling windows resume their counts,
    not recount), (b) merge-upsert replacing changed groups without
    double-counting, (c) the file source's exactly-once pickup of only
    the new files. Time-ordered halves keep every row ahead of the
    restored watermark, so nothing is legitimately droppable."""
    import shutil
    import uuid

    from duckdb_vss_spark.streaming import (
        read_staged_events_stream,
        streaming_matview,
        windowed_event_counts,
    )

    tag = uuid.uuid4().hex[:8]
    stage = f"/tmp/vss_mvr_in_{tag}"
    path = f"/tmp/vss_mvr_{tag}"
    ckpt = f"/tmp/vss_mvr_ckpt_{tag}"
    ev_static = load_table(spark, sf_dir, "events")
    b = ev_static.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = b["lo"] + (b["hi"] - b["lo"]) / 2

    def run_once():
        ev = read_staged_events_stream(spark, stage)
        agg = windowed_event_counts(ev, window="15 minutes", exact_sum=True).select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type",
            F.col("n").cast("long").alias("n"),
            "sum_value",
        )
        q = streaming_matview(agg, path, ["window_start_us", "event_type"], ckpt)
        q.awaitTermination(180)

    ev_static.where(F.col("ts") <= F.lit(mid)).coalesce(4).write.parquet(stage)
    run_once()  # first half; query stops (availableNow)
    ev_static.where(F.col("ts") > F.lit(mid)).coalesce(4).write.mode("append").parquet(stage)
    run_once()  # restart from the same checkpoint; only new files batch
    out = spark.read.parquet(path).cache()
    out.count()
    for d in (stage, path, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    return out


@register_extra(
    "q_hash_embed",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    h AS (
      SELECT doc_id,
             (ascii(substr(md5(tok), 1, 1)) * 16 + ascii(substr(md5(tok), 2, 1))) % 16 AS bucket,
             CASE WHEN ascii(substr(md5(tok), 3, 1)) % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM toks WHERE tok <> ''
    )
    SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS val
    FROM h GROUP BY doc_id, bucket
    """,
)
def q_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed text embedding (hashing trick), long form —
    model-free document vectors for the dedup family. Buckets and
    signs derive from md5 hex chars via ascii arithmetic, so both
    engines compute identical INTEGER values (no float accumulation
    anywhere). One explode + one (doc, bucket)-keyed partial→final
    aggregation; the exchange is capped at docs x dim rows."""
    from duckdb_vss_spark.pipeline.corpus import hash_embedding_long

    docs = load_table(spark, sf_dir, "documents")
    return hash_embedding_long(docs, "text", "doc_id", dim=16)


@register_extra(
    "q_media_mjpeg_frames",
    """
    SELECT doc_id AS media_id,
           CAST(f.frame_idx AS INT) AS frame_idx,
           CAST(12 AS INT) AS height, CAST(16 AS INT) AS width,
           CAST(CASE WHEN f.frame_idx = 0 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS f_first
    FROM documents
    CROSS JOIN (SELECT unnest([0, 1]) AS frame_idx) f
    WHERE doc_id % 20 = 0
    """,
)
def q_media_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL VIDEO FRAME DECODE (MJPEG profile): per sampled doc,
    synthesize a two-frame MJPEG AVI (frame 0 pure white, frame 1 pure
    black — uniform 8×8 blocks carry only a DC coefficient, so the
    values survive JPEG quantization exactly), then decode frames back
    through the container walk + the repo's own JPEG decoder and emit
    per-frame dims and the first pixel. A codec bug in the RIFF walk,
    the JPEG entropy decode, or the IDCT breaks the VALUE match, not
    just row counts. This closes the r5 seam for intra-frame video;
    H.264-class inter-frame codecs remain the documented exception."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from duckdb_vss_spark.pipeline.multimodal import attach_media_metadata, extract_frames

    def _synth(doc_id):
        from duckdb_vss_spark.pipeline.avi import encode_mjpeg_avi

        out = []
        for _d in doc_id:
            white = np.full((12, 16), 255, dtype=np.uint8)
            black = np.zeros((12, 16), dtype=np.uint8)
            out.append(encode_mjpeg_avi([white, black], fps=10, quality=90))
        return pd.Series(out)

    synth = pandas_udf(_synth, BinaryType())
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0).select("doc_id")
    media = attach_media_metadata(
        docs.withColumn("payload", synth(F.col("doc_id"))),
        "payload",
        kind="video",
        fmt="avi",
        id_col="doc_id",
    )
    return extract_frames(media, decoder="mjpeg")


@register_extra(
    "q_video_neardup",
    """
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(2 AS BIGINT) AS matched_frames
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 = 0) a
    JOIN (SELECT doc_id FROM documents WHERE doc_id % 20 = 0) b
      ON a.doc_id < b.doc_id AND a.doc_id % 3 = b.doc_id % 3
    """,
)
def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO NEAR-DUP DEDUP over real decoded frames: per sampled doc,
    synthesize a two-frame MJPEG AVI whose frame patterns depend on
    doc_id % 3 (three high-contrast variants ≥32 hamming apart, so
    JPEG quantization cannot blur variants together), hash every
    decoded frame (block-mean aHash), and find pairs whose ALIGNED
    frames match within hamming 3 via the pigeonhole-banded join. The
    oracle derives the expected pairs arithmetically: exactly the
    same-variant pairs, with both frames matched."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType

    from duckdb_vss_spark.pipeline.imagehash import (
        video_ahash_frames,
        video_neardup_pairs,
    )
    from duckdb_vss_spark.pipeline.multimodal import attach_media_metadata

    def _synth(doc_id):
        from duckdb_vss_spark.pipeline.avi import encode_mjpeg_avi

        out = []
        for d in doc_id:
            v = int(d) % 3
            f0 = np.zeros((16, 16), dtype=np.uint8)
            f1 = np.zeros((16, 16), dtype=np.uint8)
            if v == 0:
                f0[:8, :] = 255   # top half white
                f1[8:, :] = 255   # bottom half white
            elif v == 1:
                f0[:, :8] = 255   # left half white
                f1[:, 8:] = 255   # right half white
            else:
                f0[::2, :] = 255  # row stripes
                f1[:, ::2] = 255  # column stripes
            out.append(encode_mjpeg_avi([f0, f1], fps=10, quality=90))
        return pd.Series(out)

    synth = pandas_udf(_synth, BinaryType())
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0).select("doc_id")
    media = attach_media_metadata(
        docs.withColumn("payload", synth(F.col("doc_id"))),
        "payload",
        kind="video",
        fmt="avi",
        id_col="doc_id",
    )
    frames = video_ahash_frames(media, "payload", "media_id")
    return video_neardup_pairs(frames, "media_id", max_hamming=3).select(
        F.col("id_a"), F.col("id_b"), "matched_frames"
    )
