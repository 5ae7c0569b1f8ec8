"""Exactly-once foreachBatch parquet sink: replaying an epoch must not
duplicate rows (dynamic overwrite of the epoch's own partition)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.registry import load
from flights_etl_pipeline_spark.streaming.jobs import (
    stream_to_parquet_exactly_once,
)

SF_DIR = "/root/testdata/sf0.001"


def test_foreachbatch_sink_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "events_sink")
    n1 = stream_to_parquet_exactly_once(spark, SF_DIR, out)
    assert n1 >= 1
    got = spark.read.parquet(out)
    want = load(spark, SF_DIR, "events")
    assert got.count() == want.count()

    # simulate an epoch replay: re-write batch 0's partition by hand the
    # way a restarted query would (same batch_id, same data slice).
    # localCheckpoint pins the rows first -- a replayed epoch writes from
    # the source, not from the files it is about to overwrite
    min_bid = got.agg(F.min("batch_id")).collect()[0][0]
    b0 = got.filter(F.col("batch_id") == min_bid).localCheckpoint()
    (
        b0.write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(out)
    )
    # dynamic overwrite replaced only that partition; totals unchanged
    after = spark.read.parquet(out)
    assert after.count() == want.count()

    # value-level: the union of partitions equals the source exactly
    a = after.drop("batch_id")
    assert a.exceptAll(want).isEmpty() and want.exceptAll(a).isEmpty()
