"""Structured Streaming surface (SURVEY.md section 2.9).

The reference has no streaming; its incremental substitute is batch
chunking + high-watermark resume (ingestToBronze.py:59-66). This package
expresses the same event-time semantics with the real streaming API:
``readStream`` file source -> ``withWatermark`` -> windowed aggregation /
``applyInPandasWithState`` stateful sessionization -> memory sink, driven
to completion with ``Trigger.AvailableNow`` so results are deterministic
and oracle-checkable against the batch SQL.
"""

from flights_etl_pipeline_spark.streaming.jobs import (
    events_hourly_stream,
    events_hourly_stream_append,
    events_sessionize_stream,
)
from flights_etl_pipeline_spark.streaming.source import (
    EVENTS_SCHEMA,
    prepare_stream_dir,
    read_event_stream,
)

__all__ = [
    "EVENTS_SCHEMA",
    "prepare_stream_dir",
    "read_event_stream",
    "events_hourly_stream",
    "events_hourly_stream_append",
    "events_sessionize_stream",
]
