"""Perceptual image hashing + near-duplicate detection over binary
image columns — the image-side twin of the text dedup family. Web
corpora dedup images by perceptual hash (aHash/dHash class) because
byte-level hashes miss re-encodes and resizes; training pipelines run
exactly this before captioning/CLIP stages.

Spark-first shape (same architecture as SimHash text dedup):

1. **ahash**: one Arrow-batched `mapInPandas` pass decodes each image
   (the repo's own pure-stdlib PNG codec — real pixels, not a stub),
   downsamples to ``hash_size``² grayscale by block mean, and emits a
   64-bit mean-threshold hash. Map-only; bytes never shuffle — only
   (id, 8-byte hash) leaves the scan.
2. **ahash_pairs**: banded candidate join — the signature splits into
   ``blocks`` contiguous bit-blocks; two hashes within hamming <
   blocks share an intact block (pigeonhole), so candidates come from
   equality joins on small block keys, never an all-pairs scan.
   Exact `bit_count(xor)` verifies candidates.

Decode failures (non-PNG bytes) yield NULL hashes and drop out —
corpus plumbing must not die on one corrupt payload.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ahash_images", "ahash_pairs", "video_ahash_frames", "video_neardup_pairs"]


def _block_mean_gray(img: np.ndarray, hs: int) -> np.ndarray:
    """hs×hs block-mean downsample of a grayscale image (float64)."""
    h, w = img.shape
    ys = (np.arange(hs + 1) * h) // hs
    xs = (np.arange(hs + 1) * w) // hs
    out = np.empty((hs, hs), dtype=np.float64)
    for i in range(hs):
        for j in range(hs):
            out[i, j] = img[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    return out


def ahash_images(
    df: DataFrame,
    payload_col: str,
    id_col: str,
    hash_size: int = 8,
) -> DataFrame:
    """Add ``ahash`` (BIGINT): mean-threshold perceptual hash of each
    PNG payload; NULL (row dropped) when the payload fails to decode.
    Returns (id_col, ahash)."""
    if hash_size * hash_size != 64:
        raise ValueError("hash_size must be 8 (64-bit signature)")
    import pandas as pd

    def gen(batches):
        from duckdb_vss_spark.pipeline.png import PngError, decode_png, to_gray

        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = to_gray(decode_png(bytes(payload))).astype(np.float64)
                    small = _block_mean_gray(img, hash_size)
                    bits = (small >= small.mean()).flatten()
                    h = 0
                    for b in bits:
                        h = (h << 1) | int(b)
                    # store as signed 64-bit
                    if h >= 1 << 63:
                        h -= 1 << 64
                    ids.append(i)
                    hashes.append(h)
                except (PngError, ValueError, IndexError):
                    continue
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    schema = f"{id_col} long, ahash long"
    # NOT widened (r7 A/B): repartitioning the binary payloads costs
    # more than the single-task decode at this corpus size (1.14 s ->
    # 1.38 s); at real scale media lands in many files and the scan is
    # already wide.
    return df.select(id_col, payload_col).mapInPandas(gen, schema)


def ahash_pairs(
    hashes: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-duplicate image pairs (id_a < id_b, hamming <= max_hamming)
    from an ``ahash_images`` output. ``blocks > max_hamming`` (default
    4 > 3) guarantees full recall by pigeonhole; shuffle carries
    docs·blocks skinny rows, verification runs on candidates only."""
    if 64 % blocks:
        raise ValueError("blocks must divide 64")
    width = 64 // blocks
    mask = (1 << width) - 1
    # materialize the skinny (id, hash) rows ONCE before the self-join
    # (guide §4: the decode pipeline is opaque to Catalyst, so both
    # join branches — and the build side is a BroadcastExchange, which
    # ReuseExchange can never dedupe against a plain subtree — re-ran
    # the full Python decode+hash pass; measured 2 ArrowEvalPython +
    # 2 MapInPandas nodes in the q_image_phash_dedup plan, halved by
    # this checkpoint; same fix as the text-LSH pipelines, r3/r4)
    from duckdb_vss_spark.pipeline.dedup import _materialize

    hashes = _materialize(hashes.select(F.col(id_col).alias(id_col), "ahash"))
    buckets = [
        F.concat_ws(
            ":",
            F.lit(str(b)),
            F.shiftrightunsigned("ahash", 64 - (b + 1) * width)
            .bitwiseAND(F.lit(mask))
            .cast("string"),
        )
        for b in range(blocks)
    ]
    stacked = hashes.select(
        F.col(id_col).alias("id"),
        "ahash",
        F.explode(F.array(*buckets)).alias("bucket"),
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("x.ahash").alias("ha"),
            F.col("y.id").alias("id_b"),
            F.col("y.ahash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def video_ahash_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    hash_size: int = 8,
) -> DataFrame:
    """MJPEG AVI payloads → (id, frame_idx, ahash): the 64-bit
    block-mean perceptual hash of EVERY decoded frame (real decode via
    pipeline/avi.py + jpeg.py). Corrupt payloads drop their video;
    only (id, idx, 8-byte hash) rows leave the scan — frame bytes
    never shuffle."""
    if hash_size * hash_size != 64:
        raise ValueError("hash_size must be 8 (64-bit signature)")
    import pandas as pd

    def gen(batches):
        from duckdb_vss_spark.pipeline.avi import AviError, decode_mjpeg_avi
        from duckdb_vss_spark.pipeline.jpeg import JpegError
        from duckdb_vss_spark.pipeline.png import to_gray

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames = decode_mjpeg_avi(bytes(payload))
                except (AviError, JpegError):
                    continue
                for fi, fr in enumerate(frames):
                    img = to_gray(fr).astype(np.float64)
                    small = _block_mean_gray(img, hash_size)
                    bits = (small >= small.mean()).flatten()
                    h = 0
                    for b in bits:
                        h = (h << 1) | int(b)
                    if h >= 1 << 63:
                        h -= 1 << 64
                    ids.append(i)
                    idxs.append(fi)
                    hashes.append(h)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ahash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=f"{id_col} long, frame_idx int, ahash long"
    )


def video_neardup_pairs(
    frame_hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Video near-dup pairs from ``video_ahash_frames`` output:
    (id_a < id_b, matched_frames) where a frame pair matches when its
    ALIGNED (same frame_idx) hashes are within ``max_hamming``.

    Same pigeonhole-banded shape as the image/SimHash dedups, with
    frame_idx folded into the bucket key — candidates only form
    between videos sharing a hash band AT THE SAME FRAME POSITION, so
    shuffle carries frames·blocks skinny rows and verification runs on
    candidates only; videos are never compared all-pairs."""
    if 64 % blocks:
        raise ValueError("blocks must divide 64")
    width = 64 // blocks
    mask = (1 << width) - 1
    # same §4 duplicate-subtree fix as ahash_pairs: one decode pass
    # feeds both sides of the candidate self-join
    from duckdb_vss_spark.pipeline.dedup import _materialize

    frame_hashes = _materialize(
        frame_hashes.select(F.col(id_col).alias(id_col), "frame_idx", "ahash")
    )
    buckets = [
        F.concat_ws(
            ":",
            F.col("frame_idx").cast("string"),
            F.lit(str(b)),
            F.shiftrightunsigned("ahash", 64 - (b + 1) * width)
            .bitwiseAND(F.lit(mask))
            .cast("string"),
        )
        for b in range(blocks)
    ]
    stacked = frame_hashes.select(
        F.col(id_col).alias("id"),
        "frame_idx",
        "ahash",
        F.explode(F.array(*buckets)).alias("bucket"),
    )
    cand = (
        stacked.alias("x")
        .join(stacked.alias("y"), "bucket")
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.frame_idx").alias("frame_idx"),
            F.col("x.ahash").alias("ha"),
            F.col("y.ahash").alias("hb"),
        )
        .distinct()
    )
    verified = cand.where(
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= max_hamming
    )
    return (
        verified.groupBy("id_a", "id_b")
        .agg(F.count_distinct("frame_idx").cast("bigint").alias("matched_frames"))
    )
