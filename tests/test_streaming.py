"""Streaming jobs vs their batch twins at sf0.001 (fast smoke).

The sf0.01 oracle parity is the driver's gate; these tests pin the
streaming-specific mechanics: multi-batch replay determinism, watermark
closing of append windows, and stateful session timeout flushing.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_hourly_stream_matches_batch(spark):
    from flights_etl_pipeline_spark.plans.queries_events import events_hourly
    from flights_etl_pipeline_spark.streaming import jobs

    batch = events_hourly(spark, SF_DIR).select(
        "hour_start", "event_type", "n_events", "total_value"
    )
    cols = ["hour_start", "event_type", "n_events", "total_value"]
    got = _rows(jobs.events_hourly_stream(spark, SF_DIR), cols)
    want = _rows(batch, cols)
    assert got == want and len(got) > 0


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_hourly_append_emits_every_closed_window_once(spark):
    from flights_etl_pipeline_spark.plans.queries_events import events_hourly
    from flights_etl_pipeline_spark.streaming import jobs

    cols = ["hour_start", "event_type", "n_events", "total_value"]
    got = _rows(jobs.events_hourly_stream_append(spark, SF_DIR), cols)
    want = _rows(
        events_hourly(spark, SF_DIR).select(*cols),
        cols,
    )
    assert got == want  # exactly once, no duplicates, no open windows


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_sessionize_stream_matches_batch(spark):
    from flights_etl_pipeline_spark.plans.queries_events import events_sessionize
    from flights_etl_pipeline_spark.streaming import jobs

    cols = ["user_id", "session_id", "n_events", "session_start", "session_end"]
    got = _rows(jobs.events_sessionize_stream(spark, SF_DIR), cols)
    want = _rows(events_sessionize(spark, SF_DIR), cols)
    assert got == want and len(got) > 0
    assert all(r[0] >= 0 for r in got)  # sentinel users never surface
