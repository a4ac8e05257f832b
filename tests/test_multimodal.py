"""Multimodal plumbing tests: the decode is a stub, everything around it
(schemas, Arrow batch iteration, resize/frame math, feature values) is
real and checked exactly."""

from __future__ import annotations

import numpy as np
import pytest

from a3_fp_bigdata_spark.data import table
from a3_fp_bigdata_spark.multimodal import images as M
from tests.conftest import SF0001


def test_decode_stub_deterministic():
    a = M.decode_image(b"hello world " * 10)
    b = M.decode_image(b"hello world " * 10)
    assert np.array_equal(a, b)
    assert a.dtype == np.uint8 and a.ndim == 3 and a.shape[2] == 3


def test_decode_real_format_raises_without_pil():
    if M.HAVE_PIL:
        pytest.skip("PIL installed; stub gate not reachable")
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG...", "image/png")


def test_feature_extraction_matches_local_math(spark):
    media = M.media_table(spark, SF0001).limit(50)
    got = {r.media_id: r for r in M.extract_features(media).collect()}
    docs = {
        r.doc_id: r.text
        for r in table(spark, SF0001, "documents").limit(50).collect()
    }
    assert set(got) == set(docs)
    for did, text in docs.items():
        arr = M.decode_image(text.encode("utf-8"))
        means = arr.reshape(-1, 3).mean(axis=0)
        r = got[did]
        assert r.img_height == arr.shape[0] and r.img_width == arr.shape[1]
        assert abs(r.img_avg_red - means[0]) < 1e-9
        assert abs(r.img_avg_blue - means[2]) < 1e-9


def test_resize_shapes_and_determinism(spark):
    media = M.media_table(spark, SF0001).limit(20)
    rows = M.resize_images(media, 8, 8).collect()
    assert len(rows) == 20
    assert all(len(r.payload) == 8 * 8 * 3 for r in rows)
    # resize of a known array: nearest-neighbor picks exact source pixels
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    out = M.resize_nn(arr, 2, 2)
    assert np.array_equal(out, arr[[0, 2]][:, [0, 2]])


def test_frame_sampling_counts(spark):
    media = M.media_table(spark, SF0001).limit(30)
    frames = M.frame_sample(media, frame_bytes=64, every_n=3).collect()
    docs = table(spark, SF0001, "documents").limit(30).collect()
    expected = sum(
        len(range(0, len(d.text.encode("utf-8")) // 64, 3)) for d in docs
    )
    assert len(frames) == expected
    assert all(len(f.frame) == 64 for f in frames)


def test_feature_table_is_broadcast_joinable(spark):
    """The feature output joins back to documents like the reference's
    image_features dim (spark_script.py:24) — broadcast, no shuffle of
    the big side."""
    from pyspark.sql import functions as F

    media = M.media_table(spark, SF0001)
    feats = M.extract_features(media.limit(100))
    joined = media.join(F.broadcast(feats), "media_id", "left_outer")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
