"""Update output mode: per-trigger emission of CHANGED aggregate rows.

Complete mode re-emits everything (bounded cardinality only); append
emits once-final (watermark-gated); update is the middle path a live
dashboard sink consumes — each micro-batch emits only the groups it
touched, and the LATEST value per key must equal the batch answer."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_update_mode_latest_per_key_matches_batch(spark):
    from flights_etl_pipeline_spark.plans.registry import load
    from flights_etl_pipeline_spark.streaming.source import (
        prepare_stream_dir,
        read_event_stream,
    )

    stream_dir, _ = prepare_stream_dir(spark, SF_DIR, n_chunks=4)
    ev = read_event_stream(spark, stream_dir)
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))

    rows = []

    def _sink(batch_df, bid):
        for r in batch_df.collect():
            rows.append((bid, r["event_type"], r["n"]))

    ckpt = tempfile.mkdtemp(prefix="ckpt_upd_")
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    # several incremental emissions happened (not one complete dump)
    batches = {b for b, _t, _n in rows}
    assert len(batches) >= 2

    latest = {}
    for bid, etype, n in sorted(rows):
        latest[etype] = n
    want = {
        r["event_type"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert latest == want
