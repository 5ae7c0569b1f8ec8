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


def test_wav_roundtrip_matches_stdlib():
    """synth_wav output must be readable by the stdlib wave module and
    parse_wav must agree with it bit-for-bit."""
    import io
    import wave

    import numpy as np

    from flights_etl_pipeline_spark.functions.multimodal import (
        WAV_RATE,
        parse_wav,
        synth_wav,
    )

    for doc_id in (1, 4, 313, 9999997):
        payload = synth_wav(doc_id)
        ref = wave.open(io.BytesIO(payload))
        assert ref.getframerate() == WAV_RATE
        assert (ref.getnchannels(), ref.getsampwidth()) == (1, 2)
        want = np.frombuffer(ref.readframes(ref.getnframes()), dtype="<i2")
        rate, got = parse_wav(payload)
        assert rate == WAV_RATE
        assert np.array_equal(got, want)


def test_parse_wav_rejects_malformed():
    import struct

    import pytest

    from flights_etl_pipeline_spark.functions.multimodal import (
        parse_wav,
        synth_wav,
    )

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"\x00" * 64)
    # stereo flagged as unsupported, not silently mis-decoded
    good = bytearray(synth_wav(5))
    good[22:24] = struct.pack("<H", 2)  # channels=2
    with pytest.raises(ValueError, match="unsupported"):
        parse_wav(bytes(good))
    # truncated: no data chunk
    with pytest.raises(ValueError, match="missing"):
        parse_wav(bytes(synth_wav(5)[:36]))


def test_decode_media_audio_is_real():
    from flights_etl_pipeline_spark.functions.multimodal import (
        decode_media,
        synth_wav,
    )

    rate, samples = decode_media("audio", synth_wav(10))
    assert rate == 16000 and len(samples) == 160 + 10 % 320
