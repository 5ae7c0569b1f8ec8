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


def _run_ohlc_once(spark, src_dir: str, ckpt: str, out_dir: str):
    from pyspark.sql import functions as F

    from flights_etl_pipeline_spark.plans.queries_events import (
        _checked_event_id,
    )
    from flights_etl_pipeline_spark.streaming.source import read_event_stream

    ev = read_event_stream(spark, src_dir).withWatermark("ts", "1 hour")
    hour = F.date_trunc("hour", "ts")
    ordk = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(hour))
        * F.lit(2147483648).cast("long")
        + _checked_event_id(allow_negative=True)
    )
    bars = (
        ev.withColumn("ordk", ordk)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", F.col("ordk")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("ordk")).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col("w.start").alias("hour_start"), "event_type",
            "open", "high", "low", "close", "n_events",
        )
    )

    def _sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        bars.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_ohlc_stream_survives_query_restart(spark, tmp_path):
    """Windowed min_by/max_by OHLC state (one mutable buffer row per
    (window, type) group) must survive a checkpoint restart: partially
    filled bars from run 1 are completed by run 2's events, and the
    union of APPEND emissions equals the batch twin exactly — a lost
    buffer would corrupt open/close picks, not just counts."""
    import datetime as dt

    from flights_etl_pipeline_spark.plans.queries_events import (
        events_ohlc_hourly,
    )
    from flights_etl_pipeline_spark.streaming.source import prepare_stream_dir

    full_dir, max_us = prepare_stream_dir(
        spark, SF_DIR, n_chunks=4, sentinels=True
    )
    all_files = sorted(glob.glob(os.path.join(full_dir, "*.parquet")))
    chunks = [f for f in all_files if "chunk-" in f]
    sentinels = [f for f in all_files if "sentinel-" in f]

    src = str(tmp_path / "ohlc_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "ohlc_ckpt")
    out_dir = str(tmp_path / "ohlc_emitted")

    for f in chunks[:2]:
        shutil.copy2(f, src)
    out1 = _run_ohlc_once(spark, src, ckpt, out_dir)

    for f in chunks[2:] + sentinels:
        shutil.copy2(f, src)
    out2 = _run_ohlc_once(spark, src, ckpt, out_dir)

    assert len(out2) > len(out1)

    max_ts = dt.datetime.utcfromtimestamp(max_us / 1e6)
    cols = ["hour_start", "event_type", "open", "high", "low", "close",
            "n_events"]
    got = sorted(
        tuple(r[c] for c in cols) for r in out2 if r["hour_start"] <= max_ts
    )
    want = sorted(
        tuple(r[c] for c in cols)
        for r in events_ohlc_hourly(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def _run_zscore_once(spark, src_dir: str, ckpt: str, out_dir: str):
    from flights_etl_pipeline_spark.streaming import jobs
    from flights_etl_pipeline_spark.streaming.source import read_event_stream

    ev = read_event_stream(spark, src_dir).withWatermark("ts", "1 hour")
    flagged = ev.groupBy("user_id").applyInPandasWithState(
        jobs.zscore_state_fn,
        outputStructType=jobs.ZS_OUT_SCHEMA,
        stateStructType=jobs.ZS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        flagged.writeStream.foreachBatch(_sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).collect()


def test_zscore_stream_survives_query_restart(spark, tmp_path):
    """The per-user (n, sum, sumsq) integer state must survive a
    checkpoint restart: run 2's anomaly scores depend on run 1's exact
    accumulated moments, so a reset state changes n_prior and zsq for
    every post-restart event. The union of both runs' emissions must
    equal the uninterrupted stream's output exactly."""
    from flights_etl_pipeline_spark.streaming import jobs

    full_dir, _ = prepare_stream_dir_cached(spark)
    all_files = sorted(glob.glob(os.path.join(full_dir, "*.parquet")))
    chunks = [f for f in all_files if "chunk-" in f]

    src = str(tmp_path / "zs_src")
    os.makedirs(src)
    ckpt = str(tmp_path / "zs_ckpt")
    out_dir = str(tmp_path / "zs_emitted")

    for f in chunks[:2]:
        shutil.copy2(f, src)
    _run_zscore_once(spark, src, ckpt, out_dir)

    for f in chunks[2:]:
        shutil.copy2(f, src)
    out2 = _run_zscore_once(spark, src, ckpt, out_dir)

    cols = ["user_id", "event_id", "n_prior", "zsq"]
    got = sorted(tuple(r[c] for c in cols) for r in out2)
    want = sorted(
        tuple(r[c] for c in cols)
        for r in jobs.events_zscore_stream(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0


def prepare_stream_dir_cached(spark):
    from flights_etl_pipeline_spark.streaming.source import prepare_stream_dir

    return prepare_stream_dir(spark, SF_DIR, n_chunks=4, sentinels=False)
