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
    """Raw feature values (incl. the crc32 the registered query folds
    into its crc_ok bound-contract boolean) vs a pure-Python model."""
    from flights_etl_pipeline_spark.functions.multimodal import (
        FEATURE_SCHEMA,
        blob_features,
    )

    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    raw = with_blob(docs_df).mapInPandas(blob_features, schema=FEATURE_SCHEMA)
    feats = {r["doc_id"]: r for r in raw.collect()}
    docs = docs_df.collect()
    assert len(feats) == len(docs) > 0
    for d in docs:
        b = d["text"].encode("utf-8")
        f = feats[d["doc_id"]]
        assert f["byte_len"] == len(b)
        assert f["crc32"] == zlib.crc32(b)
        assert f["first_byte"] == (b[0] if b else -1)
        assert f["mean_byte"] == pytest.approx(sum(b) / len(b))


def test_registered_query_crc_contract_holds(spark):
    """The registered multimodal_features emits crc_ok == TRUE for
    every row (Python crc32 vs JVM F.crc32 over the same payload)."""
    rows = multimodal_features(spark, SF_DIR).collect()
    assert rows and all(r["crc_ok"] is True for r in rows)


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


def test_decode_media_video_decodes_vppm():
    from flights_etl_pipeline_spark.functions.multimodal import synth_vppm

    frames = decode_media("video", synth_vppm(5))
    assert len(frames) == 2 + 5 % 6
    w, h, px = frames[0]
    assert px.shape == (h, w, 3)
    # byte 0 of frame 1: (5*7 + 1*11 + 0*13) % 256
    assert int(frames[1][2].reshape(-1)[0]) == (5 * 7 + 11) % 256


def test_decode_media_video_rejects_foreign_container():
    # mp4 and friends need external codecs: an honest error, not a guess
    with pytest.raises(ValueError):
        decode_media("video", b"\x00\x00\x00\x18ftypmp42")


def test_decode_media_image_rejects_non_image():
    # image decode is real (PNG or P6 PPM): anything else is a parse
    # error, not a stub
    with pytest.raises(ValueError, match="P6 PPM"):
        decode_media("image", b"GIF89a...")
    # a bare PNG signature with no chunks is a truncated container
    with pytest.raises(ValueError, match="IHDR"):
        decode_media("image", b"\x89PNG\r\n\x1a\n")


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


def test_ppm_roundtrip_exact():
    """synth_ppm output must parse back to the exact generated raster,
    and the header comment line must be skipped correctly."""
    import numpy as np

    from flights_etl_pipeline_spark.functions.multimodal import (
        _ppm_dims,
        parse_ppm,
        synth_ppm,
    )

    for doc_id in (0, 1, 7, 313, 9999997):
        payload = synth_ppm(doc_id)
        w, h, px = parse_ppm(payload)
        assert (w, h) == _ppm_dims(doc_id)
        i = np.arange(3 * w * h, dtype=np.int64)
        want = ((doc_id * 7 + i * 13) % 256).astype(np.uint8)
        assert np.array_equal(px.reshape(-1), want)


def test_parse_ppm_rejects_malformed():
    from flights_etl_pipeline_spark.functions.multimodal import (
        parse_ppm,
        synth_ppm,
    )

    with pytest.raises(ValueError, match="P6"):
        parse_ppm(b"P3\n2 2\n255\n")  # ASCII PPM is a different format
    with pytest.raises(ValueError, match="truncated PPM raster"):
        parse_ppm(synth_ppm(5)[:-1])
    bad = synth_ppm(5).replace(b"255\n", b"65535\n", 1)
    with pytest.raises(ValueError, match="maxval"):
        parse_ppm(bad)


def test_decode_media_image_is_real():
    from flights_etl_pipeline_spark.functions.multimodal import (
        decode_media,
        synth_ppm,
    )

    w, h, px = decode_media("image", synth_ppm(10))
    assert (w, h) == (4 + 10 % 16, 3 + 10 % 8)
    assert px.shape == (h, w, 3)


def test_resize_nn_matches_reference_model():
    """resize stage == brute-force per-pixel NN reference on decoded bytes."""
    import numpy as np
    import pandas as pd

    from flights_etl_pipeline_spark.functions.multimodal import (
        RESIZE_T,
        parse_ppm,
        resize_ppm_features,
        synth_ppm,
    )

    doc_ids = [0, 3, 21, 48]
    pdf = pd.DataFrame(
        {"doc_id": doc_ids, "payload": [synth_ppm(d) for d in doc_ids]}
    )
    out = next(resize_ppm_features(iter([pdf])))
    for row, d in zip(out.itertuples(), doc_ids):
        w, h, px = parse_ppm(synth_ppm(d))
        ref = np.zeros((RESIZE_T, RESIZE_T, 3), dtype=np.int64)
        for y in range(RESIZE_T):
            for x in range(RESIZE_T):
                ref[y, x] = px[(y * h) // RESIZE_T, (x * w) // RESIZE_T]
        assert (row.rsum_r, row.rsum_g, row.rsum_b) == tuple(
            ref.sum(axis=(0, 1))
        )
        assert row.max_byte == ref.max()
