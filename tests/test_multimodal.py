"""Multimodal plumbing: decode/resize/feature/frame-sample over opaque
binary payloads (training-data mandate). Real deterministic math on
the FAKERAW container; real-codec decode is env-gated."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtreepostgis_spark.functions.multimodal import (
    byte_histogram_features,
    decode_meta,
    fakeraw_decode,
    fakeraw_encode,
    resize_nearest,
    sample_frames,
    _decode_real,
)


def _img(w, h, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def test_fakeraw_roundtrip():
    pix = _img(17, 9)
    assert np.array_equal(fakeraw_decode(fakeraw_encode(pix)), pix)


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x89PNG\r\n")


def test_decode_meta(spark):
    rows = [
        (1, bytearray(fakeraw_encode(_img(8, 4)))),
        (2, bytearray(b"not an image")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_meta(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (8, 4, 3)
    assert got[1]["ok"] and got[1]["n_bytes"] == len(rows[0][1])
    assert not got[2]["ok"] and got[2]["width"] is None
    assert not got[3]["ok"] and got[3]["n_bytes"] == 0


def test_resize_nearest_exact(spark):
    pix = _img(8, 8, 1, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(fakeraw_encode(pix)))], "doc_id long, payload binary"
    )
    out = resize_nearest(df, out_w=4, out_h=2).collect()[0]["payload"]
    got = fakeraw_decode(bytes(out))
    yi = (np.arange(2) * 8 // 2)
    xi = (np.arange(4) * 8 // 4)
    assert np.array_equal(got, pix[yi][:, xi])


def test_byte_histogram_features(spark):
    payload = bytes(range(256)) * 2
    df = spark.createDataFrame([(1, bytearray(payload))], "doc_id long, payload binary")
    feats = byte_histogram_features(df, dim=64).collect()[0]["features"]
    assert len(feats) == 64
    assert abs(sum(feats) - 1.0) < 1e-12
    assert all(abs(f - 1 / 64) < 1e-12 for f in feats)  # uniform bytes


def test_sample_frames(spark):
    frame_bytes, n_frames = 16, 10
    payload = b"".join(bytes([k]) * frame_bytes for k in range(n_frames))
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    got = sorted(
        (r["frame_idx"], bytes(r["frame"])[0])
        for r in sample_frames(df, frame_bytes, every=3).collect()
    )
    assert got == [(0, 0), (3, 3), (6, 6), (9, 9)]


def test_features_feed_ann(spark):
    """byte-histogram features plug into the ANN pairs operator."""
    from osmquadtreepostgis_spark.operators.knn import ann_cosine_pairs_grid

    rows = [(i, bytearray(bytes([(i % 4) * 50] * 64))) for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    emb = byte_histogram_features(df).select(
        F.col("doc_id").alias("vec_id"), F.col("features").alias("embedding")
    )
    pairs = ann_cosine_pairs_grid(emb, threshold=0.99, block_rows=8).collect()
    # identical payloads (same i%4) are perfect matches: 4 groups * C(4,2)
    assert len(pairs) == 4 * 6
