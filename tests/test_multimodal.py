"""Multimodal plumbing: payload/metadata schema, mapInPandas feature
values vs a pure-Python model, frame-sampling arithmetic, decode stub."""

from __future__ import annotations

import zlib

import pytest

from flights_etl_pipeline_spark.functions.multimodal import (
    FRAME_STRIDE,
    VIDEO_FPS,
    decode_media,
    with_blob,
)
from flights_etl_pipeline_spark.plans.queries_multimodal import (
    multimodal_features,
    video_frames,
)

SF_DIR = "/root/testdata/sf0.001"


def test_with_blob_schema(spark):
    docs = spark.createDataFrame(
        [(0, "alpha"), (1, "beta"), (2, "gamma")], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in with_blob(docs).collect()}
    assert rows[0]["payload"] == b"alpha"
    assert rows[0]["meta"]["media_type"] == "image"
    assert rows[0]["meta"]["width"] == 64 and rows[0]["meta"]["height"] == 48
    assert rows[1]["meta"]["media_type"] == "audio"
    assert rows[1]["meta"]["sample_rate"] == 16000
    assert rows[2]["meta"]["media_type"] == "video"
    assert rows[2]["meta"]["duration_ms"] == 1000 + 2 * 200
    assert rows[2]["meta"]["width"] is None


def test_feature_values_match_python_model(spark):
    feats = {r["doc_id"]: r for r in multimodal_features(spark, SF_DIR).collect()}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    assert len(feats) == len(docs) > 0
    for d in docs:
        b = d["text"].encode("utf-8")
        f = feats[d["doc_id"]]
        assert f["byte_len"] == len(b)
        assert f["crc32"] == zlib.crc32(b)
        assert f["first_byte"] == (b[0] if b else -1)
        assert f["mean_byte"] == pytest.approx(sum(b) / len(b))


def test_frame_sampling_arithmetic(spark):
    frames = video_frames(spark, SF_DIR).collect()
    assert frames
    for r in frames:
        assert r["frame_idx"] % FRAME_STRIDE == 0
        assert r["ts_ms"] == r["frame_idx"] * 1000 // VIDEO_FPS
    # one video doc's full sample set is contiguous strided indices
    by_doc: dict[int, list[int]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    idxs = sorted(next(iter(by_doc.values())))
    assert idxs == list(range(0, idxs[-1] + 1, FRAME_STRIDE))


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media("image", b"\x89PNG")
