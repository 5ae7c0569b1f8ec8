"""Regression: the stateful sessionizer must keep its per-user session
counter across an event-time timeout.

Scenario (flagged by review as a latent divergence): a user's open
session times out during a micro-batch in which the user has NO rows,
then the user reappears in a later batch. If the timeout handler dropped
the whole state, the counter would restart and emit a duplicate
session_id=1 that collides with the already-emitted session -- silently
diverging from the batch oracle's monotone numbering. The fix clears
only the open-session fields and preserves the counter; this test
replays exactly that sparse-user timeline.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout


def _write_chunk(spark, stream_dir: str, idx: int, rows: list) -> None:
    import shutil

    staging = os.path.join(stream_dir, f"_stage_{idx}")
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING"
    )
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    parts = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    assert len(parts) == 1
    dest = os.path.join(stream_dir, f"chunk-{idx:03d}.parquet")
    shutil.move(os.path.join(staging, parts[0]), dest)
    shutil.rmtree(staging, ignore_errors=True)
    os.utime(dest, (1_700_000_000 + idx, 1_700_000_000 + idx))


def test_counter_survives_timeout_for_sparse_user(spark, tmp_path):
    from flights_etl_pipeline_spark.streaming.jobs import (
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        _run_to_memory,
        sessionize_state_fn,
    )
    from flights_etl_pipeline_spark.streaming.source import read_event_stream

    t = lambda h, m=0: dt.datetime(2024, 5, 1, h, m)  # noqa: E731
    stream_dir = str(tmp_path / "sparse_stream")
    os.makedirs(stream_dir)
    # b0: user 7 opens a session; b1: only user 8 (watermark advances,
    # user 7's timer fires with NO user-7 rows in the batch); b2: user 7
    # returns; b3: clock-pusher so the second session also times out
    _write_chunk(spark, stream_dir, 0, [
        (1, t(10, 0), 7, "view", 1.0, None),
        (2, t(10, 5), 7, "click", 1.0, None),
    ])
    _write_chunk(spark, stream_dir, 1, [(3, t(13, 0), 8, "view", 1.0, None)])
    _write_chunk(spark, stream_dir, 2, [(4, t(14, 0), 7, "view", 1.0, None)])
    _write_chunk(spark, stream_dir, 3, [(5, t(16, 0), 8, "view", 1.0, None)])

    ev = read_event_stream(spark, stream_dir).withWatermark("ts", "30 seconds")
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        sessionize_state_fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out = _run_to_memory(sessions, "append", "sparse_sessionize")
    u7 = sorted(
        (r.session_id, r.n_events, r.session_start)
        for r in out.filter(F.col("user_id") == 7).collect()
    )
    # monotone numbering: session 2 (not a duplicate session 1) after
    # the user skipped the batch in which session 1 timed out
    assert u7 == [(1, 2, t(10, 0)), (2, 1, t(14, 0))], u7
