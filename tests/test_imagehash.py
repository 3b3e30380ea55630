"""Unit tests for perceptual image hashing (pipeline/imagehash.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.pipeline.imagehash import ahash_images, ahash_pairs
from duckdb_vss_spark.pipeline.png import encode_png


def _img_df(spark, items):
    rows = [(i, bytearray(b)) for i, b in items]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def _checker(inv_row=None, noise=()):
    cells = (np.indices((8, 8)).sum(axis=0) % 2).astype(bool)
    if inv_row is not None:
        cells[inv_row, :] = ~cells[inv_row, :]
    for (y, x) in noise:
        cells[y, x] = ~cells[y, x]
    img = np.where(cells, 255, 0).astype(np.uint8)
    return encode_png(np.repeat(np.repeat(img, 2, 0), 2, 1))


class TestAhashImages:
    def test_identical_images_identical_hash(self, spark):
        df = _img_df(spark, [(1, _checker()), (2, _checker())])
        got = {r.doc_id: r.ahash for r in ahash_images(df, "payload", "doc_id").collect()}
        assert got[1] == got[2]

    def test_noise_flips_exactly_those_bits(self, spark):
        df = _img_df(
            spark, [(1, _checker()), (2, _checker(noise=[(0, 1), (7, 6)]))]
        )
        got = {r.doc_id: r.ahash for r in ahash_images(df, "payload", "doc_id").collect()}
        assert bin((got[1] ^ got[2]) & (2**64 - 1)).count("1") == 2

    def test_resize_invariant(self, spark):
        # same pattern at 16x16 and 32x32 -> same hash (block means equal)
        cells = (np.indices((8, 8)).sum(axis=0) % 2).astype(bool)
        img8 = np.where(cells, 255, 0).astype(np.uint8)
        small = encode_png(np.repeat(np.repeat(img8, 2, 0), 2, 1))
        big = encode_png(np.repeat(np.repeat(img8, 4, 0), 4, 1))
        df = _img_df(spark, [(1, small), (2, big)])
        got = {r.doc_id: r.ahash for r in ahash_images(df, "payload", "doc_id").collect()}
        assert got[1] == got[2]

    def test_corrupt_payload_dropped_not_fatal(self, spark):
        df = _img_df(spark, [(1, _checker()), (2, b"not a png at all")])
        got = ahash_images(df, "payload", "doc_id").collect()
        assert [r.doc_id for r in got] == [1]

    def test_validation(self, spark):
        df = _img_df(spark, [(1, _checker())])
        with pytest.raises(ValueError):
            ahash_images(df, "payload", "doc_id", hash_size=4)


class TestAhashPairs:
    def test_within_hamming_found_cross_pattern_not(self, spark):
        imgs = [
            (1, _checker()),
            (2, _checker(noise=[(0, 1)])),      # hamming 1 from 1
            (3, _checker(inv_row=4)),           # hamming 8 from 1
        ]
        h = ahash_images(_img_df(spark, imgs), "payload", "doc_id")
        got = sorted(
            (r.id_a, r.id_b, r.hamming)
            for r in ahash_pairs(h, "doc_id", max_hamming=3).collect()
        )
        assert got == [(1, 2, 1)]

    def test_pigeonhole_recall_at_max_hamming(self, spark):
        # hamming exactly max_hamming=3 with blocks=4 must still be found
        imgs = [(1, _checker()), (2, _checker(noise=[(0, 1), (3, 2), (6, 5)]))]
        h = ahash_images(_img_df(spark, imgs), "payload", "doc_id")
        got = ahash_pairs(h, "doc_id", max_hamming=3, blocks=4).collect()
        assert [(r.id_a, r.id_b, r.hamming) for r in got] == [(1, 2, 3)]

    def test_validation(self, spark):
        h = ahash_images(_img_df(spark, [(1, _checker())]), "payload", "doc_id")
        with pytest.raises(ValueError):
            ahash_pairs(h, "doc_id", blocks=5)


def test_mjpeg_features_are_temporal_mean_of_frames(spark):
    """extract_features(decoder='mjpeg') must decode EVERY frame: a
    white+black two-frame clip pools to exactly 0.5 per grid cell, and
    changing one frame changes the feature."""
    import numpy as np
    from pyspark.sql import functions as F

    from duckdb_vss_spark.pipeline.avi import encode_mjpeg_avi
    from duckdb_vss_spark.pipeline.multimodal import attach_media_metadata, extract_features

    white = np.full((16, 16), 255, dtype=np.uint8)
    black = np.zeros((16, 16), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_mjpeg_avi([white, black]))),
        (2, bytearray(encode_mjpeg_avi([white, white]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    m = attach_media_metadata(df, "payload", kind="video", fmt="avi", id_col="doc_id")
    feats = {
        r["media_id"]: [float(x) for x in r["feature"]]
        for r in extract_features(m, dim=16, decoder="mjpeg").collect()
    }
    assert all(abs(x - 0.5) < 1e-6 for x in feats[1])
    assert all(abs(x - 1.0) < 1e-6 for x in feats[2])
