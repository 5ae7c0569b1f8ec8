"""Exactly-once streaming JDBC sink: the delete-then-append discipline
must make an epoch replay a no-op. Runs against embedded Derby (already
on Spark's classpath as the metastore engine), so the round-trip is a
real JDBC transaction path with zero new dependencies -- same approach
as tests/test_jdbc_roundtrip.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.registry import load
from flights_etl_pipeline_spark.streaming.jobs import stream_to_jdbc_exactly_once

SF_DIR = "/root/testdata/sf0.001"
DERBY_URL = "jdbc:derby:memory:streamsinkdb;create=true"
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
TABLE = "EVENTS_SINK"


def test_jdbc_stream_sink_exactly_once(spark):
    n = stream_to_jdbc_exactly_once(spark, SF_DIR, DERBY_URL, TABLE, DERBY_PROPS)
    assert n >= 2  # one file per trigger, 4 chunks

    got = spark.read.jdbc(DERBY_URL, TABLE, properties=DERBY_PROPS)
    want = load(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    assert got.count() == want.count()

    # simulate the crash-replay: re-run batch 0's delete-then-append by
    # hand, exactly as a restarted query whose checkpoint never saw the
    # epoch commit would. localCheckpoint pins the rows first.
    min_bid = got.agg(F.min("batch_id")).collect()[0][0]
    b0 = (
        got.filter(F.col("batch_id") == min_bid)
        .drop("batch_id")
        .localCheckpoint()
    )
    jvm = spark._sc._jvm
    conn = jvm.java.sql.DriverManager.getConnection(DERBY_URL)
    try:
        st = conn.createStatement()
        st.executeUpdate(
            f'DELETE FROM {TABLE} WHERE "batch_id" = {int(min_bid)}'
        )
        st.close()
    finally:
        conn.close()
    (
        b0.withColumn("batch_id", F.lit(int(min_bid)).cast("long"))
        .write.jdbc(DERBY_URL, TABLE, mode="append", properties=DERBY_PROPS)
    )

    after = spark.read.jdbc(DERBY_URL, TABLE, properties=DERBY_PROPS)
    assert after.count() == want.count()
    a = after.drop("batch_id")
    assert a.exceptAll(want).isEmpty() and want.exceptAll(a).isEmpty()
