"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (north star): image/audio/video payloads travel as ``binary``
columns with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so payload bytes never surface into JVM row objects.

Codec tiers: ``decoder="png"``, ``"jpeg"``, ``"wav"`` and ``"mjpeg"``
are REAL codecs — pure-stdlib implementations (pipeline/png.py: zlib
decode/unfilter/encode; pipeline/jpeg.py: baseline T.81 DCT+Huffman,
decodes external 4:2:0 files; pipeline/wav.py: RIFF/PCM decode/encode;
pipeline/avi.py: RIFF/MJPEG container whose frames decode through the
JPEG codec), so image payloads get actual pixel work (grayscale grid
features, nearest-neighbor resize, re-encode), WAV payloads actual
sample work (frame-energy features), and MJPEG video actual per-frame
PIXEL decode (``extract_frames``, temporal-mean features). MP4
container METADATA parses for real too (pipeline/mp4.py ISO-BMFF
probe → ``probe_video_metadata``). The one remaining seam is
INTER-FRAME codecs (H.264/H.265/VP9/AV1), whose CABAC/arithmetic
decode needs ffmpeg-class libraries absent here — ``decoder="fake"``
produces a deterministic feature vector from the bytes (real,
testable plumbing) and ``decoder="real"`` raises NotImplementedError
at that exact seam. Schema, partitioning, UDF signature and batch
shape are the real design in every tier.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "extract_features",
    "extract_frames",
    "probe_video_metadata",
    "resize_media",
    "sample_frames",
]

# the engine's canonical media column group
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_media_metadata(
    df: DataFrame,
    payload_col: str,
    kind: str,
    fmt: str,
    id_col: str | None = None,
    duration_ms=None,
) -> DataFrame:
    """Wrap a raw binary column into the canonical media schema.

    Pass ``id_col`` for a deterministic media_id (required for
    reproducible joins/lineage at scale); the default
    ``monotonically_increasing_id`` depends on partition layout.
    ``duration_ms`` may be a Column for video/audio rows."""
    return df.select(
        (F.col(id_col).cast("long") if id_col else F.monotonically_increasing_id()).alias(
            "media_id"
        ),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (
                duration_ms.cast("long")
                if duration_ms is not None
                else F.lit(None).cast("long")
            ).alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int):
    """Deterministic stand-in for a codec: hash bytes → feature vector."""
    import hashlib

    import numpy as np

    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def _png_features(payload: bytes, dim: int):
    """REAL decode path: PNG → grayscale → nearest-neighbor sample a
    square grid of ``dim`` points (dim must be a square) → [0,1]
    floats. Point samples, not pooled means — cheap and deterministic;
    swap in block-mean pooling here if anti-aliased features matter."""
    import math

    import numpy as np

    from duckdb_vss_spark.pipeline.png import decode_png, resize_nearest, to_gray

    side = int(math.isqrt(dim))
    if side * side != dim:
        raise ValueError(f"png feature dim must be a perfect square, got {dim}")
    gray = to_gray(decode_png(payload))
    pooled = resize_nearest(gray, side, side)
    return (pooled.reshape(-1) / 255.0).astype(np.float32)


def _wav_features(payload: bytes, dim: int):
    """REAL audio decode path: WAV → channel-mean → ``dim``-frame RMS
    energy vector in [0, 1] (pipeline/wav.py)."""
    from duckdb_vss_spark.pipeline.wav import decode_wav, frame_energy

    samples, _rate = decode_wav(payload)
    return frame_energy(samples, dim)


def _jpeg_features(payload: bytes, dim: int):
    """REAL decode path: baseline JPEG → grayscale → nearest-neighbor
    sample a square grid of ``dim`` points → [0,1] floats (same grid
    contract as _png_features; pipeline/jpeg.py)."""
    import math

    import numpy as np

    from duckdb_vss_spark.pipeline.jpeg import decode_jpeg
    from duckdb_vss_spark.pipeline.png import resize_nearest, to_gray

    side = int(math.isqrt(dim))
    if side * side != dim:
        raise ValueError(f"jpeg feature dim must be a perfect square, got {dim}")
    gray = to_gray(decode_jpeg(payload))
    pooled = resize_nearest(gray, side, side)
    return (pooled.reshape(-1) / 255.0).astype(np.float32)


def _mjpeg_features(payload: bytes, dim: int):
    """REAL video decode path: MJPEG AVI → decode every frame (repo
    JPEG codec) → temporal mean over frames → same spatial grid
    contract as the image paths. The temporal mean is the cheapest
    content summary that still reflects every frame's pixels — a
    changed frame changes the feature."""
    import math

    import numpy as np

    from duckdb_vss_spark.pipeline.avi import decode_mjpeg_avi
    from duckdb_vss_spark.pipeline.png import resize_nearest, to_gray

    side = int(math.isqrt(dim))
    if side * side != dim:
        raise ValueError(f"mjpeg feature dim must be a perfect square, got {dim}")
    frames = decode_mjpeg_avi(payload)
    acc = np.zeros((side, side), dtype=np.float64)
    for fr in frames:
        acc += resize_nearest(to_gray(fr), side, side)
    pooled = acc / len(frames)
    return (pooled.reshape(-1) / 255.0).astype(np.float32)


def extract_features(
    df: DataFrame, dim: int = 64, decoder: str = "fake", batch_limit_bytes: int = 64 << 20
) -> DataFrame:
    """media rows → (media_id, feature array<float>).

    ``decoder="png"``/``"jpeg"`` run the real stdlib image codecs
    (decode → gray → sampled pixel grid); ``"wav"`` runs the real
    stdlib WAV codec (decode → frame-energy vector); ``"mjpeg"`` runs
    the real MJPEG video path (every frame decoded, temporal-mean
    grid); ``"fake"`` hashes bytes to a deterministic vector;
    ``"real"`` marks the seam for inter-frame codecs absent here
    (H.264-class needs ffmpeg).

    Arrow batches flow through ``mapInPandas``; ``batch_limit_bytes``
    documents the contract that a partition's in-flight payload batch is
    bounded (set ``spark.sql.execution.arrow.maxRecordsPerBatch``
    accordingly for large payloads at scale)."""
    if decoder not in ("fake", "png", "jpeg", "wav", "mjpeg", "real"):
        raise ValueError(
            "decoder must be 'fake', 'png', 'jpeg', 'wav', 'mjpeg' or 'real'"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                # the seam where ffmpeg would decode INTER-FRAME codecs
                # (H.264-class); PNG/JPEG/WAV/MJPEG are real
                raise NotImplementedError(
                    "inter-frame codecs require libraries not present in "
                    "this environment; use decoder='png', 'jpeg', 'wav' or "
                    "'mjpeg' (all real) or 'fake'"
                )
            if decoder == "png":
                feats = [_png_features(p, dim) for p in pdf["payload"]]
            elif decoder == "jpeg":
                feats = [_jpeg_features(p, dim) for p in pdf["payload"]]
            elif decoder == "wav":
                feats = [_wav_features(p, dim) for p in pdf["payload"]]
            elif decoder == "mjpeg":
                feats = [_mjpeg_features(p, dim) for p in pdf["payload"]]
            else:
                feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": [f.tolist() for f in feats]}
            )

    return df.mapInPandas(run, schema="media_id long, feature array<float>")


def resize_media(
    df: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """media rows → media rows with payload re-encoded at (width, height)
    and meta.width/height set — the resize stage of an image pipeline.

    Plumbing is real in every tier (Arrow-batched payload-in/payload-out
    mapInPandas preserving the canonical media schema). Pixel work:
    ``decoder='png'``/``'jpeg'`` run the REAL stdlib codecs — decode,
    nearest-neighbor resample to (width, height), re-encode same
    format; ``'fake'`` emits a deterministic payload of exactly
    width·height bytes derived from the source bytes (so downstream
    size/shape contracts are testable without a codec); ``'real'``
    raises at the seam where ffmpeg would handle other formats."""
    if decoder not in ("fake", "png", "jpeg", "real"):
        raise ValueError("decoder must be 'fake', 'png', 'jpeg' or 'real'")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        n = width * height
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real resize for non-PNG/JPEG formats requires codec "
                    "libraries not present in this environment"
                )
            out = []
            for p in pdf["payload"]:
                src = bytes(p or b"")
                if decoder == "png":
                    from duckdb_vss_spark.pipeline.png import (
                        decode_png,
                        encode_png,
                        resize_nearest,
                    )

                    out.append(encode_png(resize_nearest(decode_png(src), width, height)))
                    continue
                if decoder == "jpeg":
                    from duckdb_vss_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
                    from duckdb_vss_spark.pipeline.png import resize_nearest

                    out.append(encode_jpeg(resize_nearest(decode_jpeg(src), width, height)))
                    continue
                # deterministic fake: stretch/shrink the byte stream to
                # exactly w·h bytes, seeded by a content hash
                rep = (src * (n // max(len(src), 1) + 1))[:n] if src else bytes(n)
                out.append(hashlib.sha256(src).digest()[:1] + rep[1:] if n else b"")
            res = pdf.copy()
            res["payload"] = out
            res["meta"] = [
                {**(m if isinstance(m, dict) else m.asDict()), "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield res

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def probe_video_metadata(df: DataFrame) -> DataFrame:
    """media rows → media rows with meta.duration_ms/width/height
    REPLACED by values probed from the payload's MP4 box headers
    (pipeline/mp4.py — real ISO-BMFF parsing, no ffmpeg). Non-video
    rows and rows whose payload fails the probe pass through with their
    original metadata. Downstream ``sample_frames`` then derives its
    frame grid from actual container bytes instead of caller-supplied
    durations."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        from duckdb_vss_spark.pipeline.mp4 import Mp4Error, probe_mp4

        for pdf in batches:
            metas = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                m = dict(meta if isinstance(meta, dict) else meta.asDict())
                if m.get("kind") == "video":
                    try:
                        info = probe_mp4(bytes(payload or b""))
                        m["duration_ms"] = info["duration_ms"]
                        m["width"] = info["width"]
                        m["height"] = info["height"]
                    except (Mp4Error, struct.error, IndexError):
                        # Mp4Error is the probe's contract; struct/Index
                        # guard against any parser gap so one malformed
                        # payload can never fail the whole Spark job
                        pass  # keep caller-supplied metadata
                metas.append(m)
            res = pdf.copy()
            res["meta"] = metas
            yield res

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """video rows → (media_id, frame_idx, frame_ts_ms) — frame sampling
    plumbing; frame payload decoding is behind the same stub seam."""
    if decoder == "real":
        raise NotImplementedError("real frame extraction requires ffmpeg; use decoder='fake'")
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest((dur / every_ms).cast("int") - 1, F.lit(0)))
    return (
        df.where(F.col("meta.kind") == "video")
        .select("media_id", F.explode(idx).alias("frame_idx"))
        .withColumn("frame_ts_ms", (F.col("frame_idx") * every_ms).cast("long"))
    )


def extract_frames(df: DataFrame, decoder: str = "mjpeg") -> DataFrame:
    """video rows → (media_id, frame_idx, height, width, f_first):
    REAL per-frame PIXEL decode for the MJPEG profile — every AVI
    ``00dc`` chunk is an independent baseline JPEG, decoded by the
    repo's own codec (pipeline/avi.py + jpeg.py). ``f_first`` is the
    first pixel of each frame normalized to [0, 1], so a query pins
    decoded VALUES, not just shapes.

    ``decoder="real"`` remains the seam for inter-frame entropy-coded
    codecs (H.264/H.265/VP9/AV1), whose CABAC/arithmetic decode needs
    codec libraries absent from this environment; MJPEG, images, and
    audio are fully real. Corrupt payloads drop their row (a poisoned
    file can't fail a 100 TB scan); only derived scalars leave the
    worker — frame bytes never shuffle."""
    if decoder not in ("mjpeg", "real"):
        raise ValueError("decoder must be 'mjpeg' or 'real'")
    if decoder == "real":
        raise NotImplementedError(
            "inter-frame codecs (H.264/H.265/VP9/AV1) require codec "
            "libraries not present in this environment; MJPEG decode is "
            "real — use decoder='mjpeg' on AVI payloads"
        )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        from duckdb_vss_spark.pipeline.avi import AviError, decode_mjpeg_avi
        from duckdb_vss_spark.pipeline.jpeg import JpegError

        for pdf in batches:
            ids, idxs, hs, ws, firsts = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    frames = decode_mjpeg_avi(bytes(payload or b""))
                except (AviError, JpegError):
                    continue  # poisoned payload: drop row, keep the job
                for i, fr in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    firsts.append(float(fr.reshape(-1)[0]) / 255.0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "f_first": pd.Series(firsts, dtype="float64"),
                }
            )

    return df.mapInPandas(
        run,
        schema="media_id long, frame_idx int, height int, width int, f_first double",
    )
