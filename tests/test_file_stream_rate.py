"""Incremental file-source streaming with rate limiting.

The lake-ingestion pattern: a directory drip-fed by an upstream writer,
consumed as a stream with ``maxFilesPerTrigger`` bounding each
micro-batch (state and memory stay flat no matter how far behind the
consumer is). AvailableNow + the limit must drain the backlog across
SEVERAL batches, not one giant catch-up batch."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F


def test_backlog_drains_in_bounded_batches(spark, tmp_path):
    src = str(tmp_path / "drip")
    # three separate files = three units of arrival
    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "event_type"
    )
    for i in range(3):
        base.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    schema = base.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_rate_")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rate_drain")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = q.recentProgress
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)

    # the backlog drained in >= 3 bounded batches, not one
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 3, [p["numInputRows"] for p in progress]
    total = sum(p["numInputRows"] for p in progress)
    assert total == base.count()
    # and the final state equals the batch answer
    got = {
        r["event_type"]: r["n"] for r in spark.table("rate_drain").collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in base.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
