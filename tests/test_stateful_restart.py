"""State-store recovery: a stateful streaming query stopped mid-stream
and RESTARTED from its checkpoint must continue exactly — open sessions
(including their per-user session counters) live in the state store,
not the process.

This is the crash-recovery contract a 1000-executor deployment leans
on: the first run drains half the chunks and terminates with sessions
still open; the second run (new query instance, same checkpoint) feeds
the remaining chunks + watermark sentinels. The union of both runs'
emissions must equal the batch oracle — any lost or re-initialized
state shows up as missing, duplicated, or renumbered sessions.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql.streaming.state import GroupStateTimeout

SF_DIR = "/root/testdata/sf0.001"


def _run_once(spark, src_dir: str, ckpt: str, out_dir: str):
    from flights_etl_pipeline_spark.streaming import jobs
    from flights_etl_pipeline_spark.streaming.source import read_event_stream

    ev = read_event_stream(spark, src_dir).withWatermark("ts", "30 seconds")
    sessions = ev.groupBy("user_id").applyInPandasWithState(
        jobs.sessionize_state_fn,
        outputStructType=jobs.SESSION_OUT_SCHEMA,
        stateStructType=jobs.SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

    # the memory sink cannot recover from a checkpoint; foreachBatch can
    def _sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        sessions.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_sessionize_survives_query_restart(spark, tmp_path):
    from flights_etl_pipeline_spark.plans.queries_events import (
        events_sessionize,
    )
    from flights_etl_pipeline_spark.streaming.source import prepare_stream_dir

    full_dir, _ = prepare_stream_dir(
        spark, SF_DIR, n_chunks=4, sentinels=True
    )
    all_files = sorted(glob.glob(os.path.join(full_dir, "*.parquet")))
    chunks = [f for f in all_files if "chunk-" in f]
    sentinels = [f for f in all_files if "sentinel-" in f]
    assert len(chunks) == 4 and len(sentinels) == 2

    src = str(tmp_path / "restart_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "emitted")

    # run 1: first half of the stream; terminates with sessions open
    for f in chunks[:2]:
        shutil.copy2(f, src)  # copy2 keeps the pinned mtime ordering
    out1 = _run_once(spark, src, ckpt, out_dir)

    # the stream "resumes": remaining chunks + watermark sentinels land
    for f in chunks[2:] + sentinels:
        shutil.copy2(f, src)
    out2 = _run_once(spark, src, ckpt, out_dir)

    assert len(out2) > len(out1)  # the restarted run actually emitted

    cols = ["user_id", "session_id", "n_events", "session_start",
            "session_end"]
    got = sorted(
        tuple(r[c] for c in cols) for r in out2 if r["user_id"] >= 0
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in events_sessionize(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0
