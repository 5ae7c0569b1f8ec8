"""Hypothesis property tests for round-2 primitives (no Spark session:
these pin the pure-Python kernels the Spark plans call)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=100_000))
def test_vppm_roundtrip_any_doc_id(doc_id):
    from flights_etl_pipeline_spark.functions.multimodal import (
        _ppm_dims,
        _video_n_frames,
        parse_vppm,
        synth_vppm,
    )

    frames = parse_vppm(synth_vppm(doc_id))
    w, h = _ppm_dims(doc_id)
    assert len(frames) == _video_n_frames(doc_id)
    for f, (fw, fh, px) in enumerate(frames):
        assert (fw, fh) == (w, h)
        i = np.arange(3 * w * h, dtype=np.int64)
        want = ((doc_id * 7 + f * 11 + i * 13) % 256).astype(np.uint8)
        assert np.array_equal(px.reshape(-1), want)


@settings(max_examples=30, deadline=None)
@given(
    st.binary(min_size=0, max_size=64).filter(lambda b: b[:4] != b"VPPM")
)
def test_vppm_rejects_garbage(payload):
    import pytest

    from flights_etl_pipeline_spark.functions.multimodal import parse_vppm

    with pytest.raises(ValueError):
        parse_vppm(payload)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=100_000),
    st.integers(min_value=0, max_value=10),
)
def test_vppm_truncation_always_detected(doc_id, cut):
    """Chopping ANY suffix off a valid container (into the last frame's
    raster or beyond) must raise, never silently decode fewer bytes."""
    import pytest

    from flights_etl_pipeline_spark.functions.multimodal import (
        parse_vppm,
        synth_vppm,
    )

    payload = synth_vppm(doc_id)
    truncated = payload[: len(payload) - 1 - cut]
    with pytest.raises(ValueError):
        parse_vppm(truncated)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=100_000))
def test_png_roundtrip_any_doc_id(doc_id):
    """Per-byte decode oracle: every pixel of the PNG (signature, CRC'd
    chunk walk, two IDATs, all five scanline filters in play) must come
    back as the generating formula, and must equal the PPM codec's
    decode of the same logical image."""
    from flights_etl_pipeline_spark.functions.multimodal import (
        _ppm_dims,
        parse_png,
        parse_ppm,
        synth_png,
        synth_ppm,
    )

    w0, h0 = _ppm_dims(doc_id)
    w, h, px = parse_png(synth_png(doc_id))
    assert (w, h) == (w0, h0)
    i = np.arange(3 * w * h, dtype=np.int64)
    want = ((doc_id * 7 + i * 13) % 256).astype(np.uint8)
    assert np.array_equal(px.reshape(-1), want)
    assert np.array_equal(px, parse_ppm(synth_ppm(doc_id))[2])


@settings(max_examples=30, deadline=None)
@given(
    st.binary(min_size=0, max_size=64).filter(
        lambda b: b[:8] != b"\x89PNG\r\n\x1a\n"
    )
)
def test_png_rejects_garbage(payload):
    import pytest

    from flights_etl_pipeline_spark.functions.multimodal import parse_png

    with pytest.raises(ValueError):
        parse_png(payload)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=100_000),
    st.integers(min_value=0, max_value=16),
)
def test_png_truncation_always_detected(doc_id, cut):
    """Chopping ANY suffix off a valid PNG (losing IEND, part of a CRC,
    or IDAT bytes) must raise, never silently decode."""
    import pytest

    from flights_etl_pipeline_spark.functions.multimodal import (
        parse_png,
        synth_png,
    )

    payload = synth_png(doc_id)
    with pytest.raises(ValueError):
        parse_png(payload[: len(payload) - 1 - cut])


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=100_000),
    st.integers(min_value=8, max_value=200),
)
def test_png_bitflip_fails_some_crc(doc_id, pos):
    """Flipping any byte inside the chunk region either fails a CRC,
    breaks the zlib stream, or corrupts a length field -- a decode that
    returns pixels after a flip in the first 200 bytes would mean the
    CRC walk is not actually checking."""
    import pytest

    from flights_etl_pipeline_spark.functions.multimodal import (
        parse_png,
        synth_png,
    )

    payload = bytearray(synth_png(doc_id))
    pos = min(pos, len(payload) - 5)  # stay clear of the final CRC tail
    payload[pos] ^= 0xFF
    with pytest.raises((ValueError, Exception)):
        parse_png(bytes(payload))
