"""Streaming observability: StreamingQueryListener progress metrics.

Production streaming jobs are monitored through listener progress events
(numInputRows, batch durations, state-store rows), not log scraping.
Pin that the listener surface works against a real job: attach one,
drain an AvailableNow query, and assert the progress events carried the
row counts the job actually processed.
"""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener

SF_DIR = "/root/testdata/sf0.001"


class _Collect(StreamingQueryListener):
    def __init__(self):
        self.started = []
        self.progress = []
        self.terminated = []

    def onQueryStarted(self, event):
        self.started.append(event.id)

    def onQueryProgress(self, event):
        self.progress.append(event.progress)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        self.terminated.append(event.id)


def test_listener_reports_input_rows(spark):
    from flights_etl_pipeline_spark.plans.registry import load
    from flights_etl_pipeline_spark.streaming.jobs import events_hourly_stream

    listener = _Collect()
    spark.streams.addListener(listener)
    try:
        out = events_hourly_stream(spark, SF_DIR)
        assert out.count() > 0
        # listener events are delivered asynchronously on the JVM bus
        deadline = time.time() + 30
        while time.time() < deadline and not listener.progress:
            time.sleep(0.5)
        assert listener.started, "no started event"
        total_in = sum(p.numInputRows for p in listener.progress)
        n_events = load(spark, SF_DIR, "events").count()
        assert total_in == n_events, (total_in, n_events)
    finally:
        spark.streams.removeListener(listener)
