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
        n_events = load(spark, SF_DIR, "events").count()
        # listener events are delivered asynchronously on the JVM bus;
        # the shared session may carry queries from other tests, so
        # count only progress of queries whose START we observed (the
        # listener attached just before this job ran)
        def _mine():
            started = {str(i) for i in listener.started}
            return [p for p in listener.progress if str(p.id) in started]

        deadline = time.time() + 60
        while time.time() < deadline and (
            sum(p.numInputRows for p in _mine()) < n_events
        ):
            time.sleep(0.5)
        assert listener.started, "no started event"
        total_in = sum(p.numInputRows for p in _mine())
        assert total_in == n_events, (total_in, n_events)
    finally:
        spark.streams.removeListener(listener)
