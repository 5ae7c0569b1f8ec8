"""Event-table queries: batch event-time windows, sessionization, JSON
extraction, first-event dedup (SURVEY.md section 2.9 mapping).

The reference has no streaming; its incremental substitute is batch
chunking + high-watermark resume (ingestToBronze.py:59-66). These queries
express the same event-time semantics Structured Streaming would use --
tumbling windows, watermark-style max-ts, gap sessionization -- in batch
mode over the ``events`` table, per SURVEY.md section 2.9. The streaming/
package runs the same logic with readStream + withWatermark.

Scale: every query here shuffles by (user_id) or (window, type) -- both
high-cardinality and uniform. Sessionization uses one window function pass,
not per-user collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flights_etl_pipeline_spark.functions.scalar import dround, dsum
from flights_etl_pipeline_spark.plans.registry import (
    load,
    model_channel,
    register,
)

# ---------------------------------------------------------------------------
# Tumbling event-time window (batch groupBy(F.window(...)))
# ---------------------------------------------------------------------------


@register(
    "events_hourly",
    oracle="""
SELECT DATE_TRUNC('hour', ts) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY DATE_TRUNC('hour', ts), event_type
""",
    survey=["streaming-batch", "G3"],
    bench=True,
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window x event_type rollup -- the batch expression
    of a streaming windowed aggregation (window.start == date_trunc)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 6).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (lag + cumulative-flag; one shuffle by user)
# ---------------------------------------------------------------------------

SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM sessions
GROUP BY user_id, session_id
"""


@register(
    "events_sessionize",
    oracle=SESSIONIZE_SQL,
    survey=["window", "streaming-batch"],
    bench=True,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: lag -> boundary flag -> running sum.

    The batch equivalent of a stateful session window
    (applyInPandasWithState / session_window in streaming); integer
    microsecond arithmetic keeps the gap comparison engine-exact.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (us - F.lag(us).over(w) > 1_800_000_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_sess").over(run).alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# JSON property extraction (props is a JSON-ish string column)
# ---------------------------------------------------------------------------


@register(
    "events_json_stats",
    oracle="""
SELECT event_type,
       CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INT))
            AS BIGINT) AS k_sum,
       MIN(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
       MAX(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_max,
       COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS k_count
FROM events
GROUP BY event_type
""",
    survey=["json", "G3"],
)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the props column + integer aggregates."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
        F.count(k).alias("k_count"),
    )


# ---------------------------------------------------------------------------
# First-event-per-key dedup (drop-duplicates-keep-earliest)
# ---------------------------------------------------------------------------


@register(
    "events_first_per_user_type",
    oracle="""
SELECT user_id, event_type, event_id AS first_event_id, ts AS first_ts
FROM (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
""",
    survey=["dedup-exact", "window"],
)
def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-earliest dedup by key: deterministic dropDuplicates via
    row_number (plain dropDuplicates is arrival-order-dependent, which is
    exactly what you cannot rely on under a shuffle at scale)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Share-of-total via window-over-aggregate
# ---------------------------------------------------------------------------


@register(
    "event_type_shares",
    oracle="""
SELECT event_type, n_events,
       FLOOR(CAST(n_events AS DOUBLE) / SUM(n_events) OVER ()
             * 1000000 + 0.5) / 1000000 AS share
FROM (SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type)
""",
    survey=["window", "G3"],
)
def event_type_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate + unpartitioned window: share of total per event type."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy()
    return counts.select(
        "event_type",
        "n_events",
        dround(
            F.col("n_events").cast("double") / F.sum("n_events").over(w), 6
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Salted two-phase aggregation (skew mitigation with exact parity)
# ---------------------------------------------------------------------------


@register(
    "events_salted_agg",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
""",
    survey=["skew-salting", "G3"],
)
def events_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation: salt the hot key space 16 ways, partial-agg
    on (key, salt), then final-agg on key.

    ``event_type`` is low-cardinality — the textbook skew shape where a
    plain groupBy funnels each key through one reducer. Salting bounds
    any single task at ~1/16 of a hot key; the decimal partials make the
    two-phase sum bit-equal to the one-phase oracle (exact decimal
    addition is associative). Spark's own partial aggregation does this
    within partitions; explicit salting is the pattern for when the
    *post-shuffle* key is still too hot (and what AQE skew-join cannot
    fix for aggregations).
    """
    ev = load(spark, sf_dir, "events")
    partial = ev.groupBy(
        "event_type", (F.col("event_id") % 16).alias("salt")
    ).agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("ps"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"),
        F.sum("ps").cast("double").alias("total_value"),
    )


_N_JOIN_SALT = 16


@register(
    "events_salted_join",
    oracle="""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS type_events,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS type_value
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, s.type_events,
       FLOOR(e.value / s.type_value * 1000000 + 0.5) / 1000000
         AS value_share
FROM events e JOIN stats s ON e.event_type = s.event_type
""",
    survey=["skew-salting", "join", "G3"],
)
def events_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe JOIN twin of ``events_salted_agg``: enrich every event
    with its type's totals through a SALTED shuffle join instead of a
    broadcast.

    ``event_type`` has 5 values — a plain shuffle join funnels each hot
    key through one task. Salting replicates each dim row ``_N_JOIN_SALT``
    ways (explode) while the fact side derives a deterministic salt from
    ``event_id``; the join key becomes (event_type, salt), splitting
    every hot key across 16 tasks. The SHUFFLE_HASH hint pins the
    non-broadcast strategy the pattern exists for — at 100 TB the
    enrichment side (per-key aggregates over billions of keys) does not
    broadcast, and AQE's skew splitting handles only the sort-merge
    case, not the replicated-dim discipline shown here. Results are
    salt-invariant: each fact row matches exactly one replica.
    """
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_events"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("type_value"),
    )
    salted_dim = stats.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_N_JOIN_SALT - 1)))
    )
    fact = ev.withColumn(
        "salt", (F.col("event_id") % _N_JOIN_SALT).cast("int")
    )
    return (
        fact.join(
            salted_dim.hint("shuffle_hash"), ["event_type", "salt"]
        )
        .select(
            "event_id",
            "event_type",
            "type_events",
            dround(F.col("value") / F.col("type_value"), 6).alias(
                "value_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# As-of join: each click joined to the user's most recent prior purchase
# ---------------------------------------------------------------------------


@register(
    "events_asof_join",
    oracle="""
WITH tagged AS (
  SELECT user_id, event_id, ts, event_type,
         LAST_VALUE(CASE WHEN event_type = 'purchase' THEN event_id END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS asof_purchase_id,
         LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS asof_purchase_ts
  FROM events
)
SELECT user_id, event_id, ts, asof_purchase_id, asof_purchase_ts
FROM tagged WHERE event_type = 'click'
""",
    survey=["asof-join", "window"],
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (most-recent-prior) join expressed as a composition of
    existing DataFrame ops — Spark has no native ASOF JOIN, and the
    union-tag-window form is the scale-clean rewrite: ONE shuffle by
    user_id, no per-key search, no range explosion. The exclusive upper
    frame bound (`-1`) gives strict "prior" semantics.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    tagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("asof_purchase_id"),
        F.last(F.when(is_p, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("asof_purchase_ts"),
    )
    return tagged.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts", "asof_purchase_id", "asof_purchase_ts"
    )


# ---------------------------------------------------------------------------
# Range join via time-bucketing (same-user event pairs within 5 minutes)
# ---------------------------------------------------------------------------

_RANGE_US = 300_000_000  # 5 minutes


@register(
    "events_range_join_pairs",
    oracle=f"""
SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 1 AND {_RANGE_US}
""",
    survey=["range-join", "J1-family"],
)
def events_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join rewritten as a bucketed equi-join: hash each side into
    5-minute time buckets, equi-join on (user, bucket) with the left side
    exploded to its two candidate buckets, then apply the exact range
    predicate. At scale this is the difference between a theta-join
    (broadcast-nested-loop over everything) and a plain shuffled hash
    join that touches only adjacent buckets.
    """
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    a = ev.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        us.alias("us_a"),
        F.explode(
            F.array(
                (us / _RANGE_US).cast("long"),
                (us / _RANGE_US).cast("long") + 1,
            )
        ).alias("bucket"),
    )
    b = ev.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("user_b"),
        us.alias("us_b"),
        (us / _RANGE_US).cast("long").alias("bucket"),
    )
    gap = F.col("us_b") - F.col("us_a")
    return (
        a.join(
            b,
            (F.col("user_id") == F.col("user_b"))
            & (a["bucket"] == b["bucket"]),
        )
        .filter((gap >= 1) & (gap <= _RANGE_US))
        .select("event_a", "event_b", "user_id", gap.alias("gap_us"))
    )


# ---------------------------------------------------------------------------
# Distinct counting: exact shuffle-dedup vs HLL sketches (the 100 TB path)
# ---------------------------------------------------------------------------


@register(
    "events_distinct_users",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
    survey=["count-distinct", "G3"],
)
def events_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group. Spark plans this as a two-phase
    expand + partial dedup (distinct keys are deduped map-side before the
    exchange), so the shuffle carries unique (event_type, user_id) pairs,
    not raw events — the exact-count plan that still works at 100 TB
    when key cardinality fits the cluster. When it doesn't, switch to the
    HLL sketch twin (``events_hll_daily_merge``)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def _hll_daily_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch pipeline itself: one DataSketches HLL per (day,
    event_type) partition, merged per event_type, estimated. Returns
    (event_type, approx_users, n_days) — the raw estimate is consumed
    by the registered query's bound check and by
    tests/test_sketches.py's tighter 5-sigma assertion."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


@register(
    "events_hll_daily_merge",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS hll_within_bound
FROM events
GROUP BY event_type
""",
    survey=["approx-sketch", "hll", "incremental"],
)
def events_hll_daily_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental distinct-count maintenance with Apache DataSketches HLL:
    build one sketch per (day, event_type) partition, then merge the
    per-day sketches per event_type and estimate.

    This is the 100 TB pattern the exact plan can't reach: per-partition
    sketches are tiny (<= 1.5 KB), the merge is associative (a daily
    pipeline persists day-level sketches and re-merges without rescanning
    history), and the shuffle carries sketch bytes instead of user_ids.

    Oracle contract (VERDICT r6 item 6): the raw estimate is
    engine-private (DuckDB cannot run DataSketches), but its ERROR
    BOUND is mirrorable — the query emits the exact scaffolding
    (n_days, exact_users) plus ``hll_within_bound``, the in-plan check
    that the merged estimate sits within max(3, 8%) of exact, and the
    oracle asserts the same columns with the bound as a constant TRUE.
    A broken sketch/merge/estimate flips the boolean and fails the
    hash, so the sketch pipeline is now oracle-gated end-to-end; the
    tighter 5-sigma band on the raw value stays in
    tests/test_sketches.py. (The exact_users companion is verification
    scaffolding — the 100 TB deployment drops it and keeps only the
    sketch path.)

    Bound caveat (ADVICE r7): the max(3, 8%) band is ~5 sigma for
    lgK=12 HLL and DETERMINISTIC FOR A FIXED FIXTURE — it either holds
    or it doesn't, and it holds for the committed corpus at every SF.
    It is still a probabilistic statement about the sketch, and HLL
    tail error is not strictly Gaussian: if the driver regenerates the
    corpus and this query's hash ever flips with no sketch-code change,
    diagnose it as a statistical tail event of the NEW fixture (widen
    the gate bound or reseed), not as a sketch/merge regression — the
    regression signal for sketch code is tests/test_sketches.py."""
    est = _hll_daily_estimates(spark, sf_dir)
    exact = (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact_users"))
    )
    bound = F.greatest(F.lit(3.0), 0.08 * F.col("exact_users"))
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.col("exact_users").cast("bigint").alias("exact_users"),
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= bound).alias(
            "hll_within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# Funnel analysis: ordered multi-stage conversion (view -> click -> purchase)
# ---------------------------------------------------------------------------


@register(
    "events_funnel",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS first_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.first_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL
SELECT '2_click' AS stage, COUNT(*) AS n_users FROM c
UNION ALL
SELECT '3_purchase' AS stage, COUNT(*) AS n_users FROM p
""",
    survey=["funnel", "sequence", "J1-family"],
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered conversion funnel: users whose first view is
    later followed by a click, later followed by a purchase.

    Each stage is (filter -> hash agg keyed user_id) joined to the
    previous stage's per-user frontier timestamp. All three aggregates
    and both joins hash-partition on the SAME key (user_id), so after
    the first exchange every subsequent stage is shuffle-free
    (Exchange reuse / ENSURE_REQUIREMENTS no-op) -- the funnel depth
    adds no extra shuffles at 100 TB, and per-stage frontiers are
    one row per user, shrinking monotonically down the funnel.
    """
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )

    def _count(df: DataFrame, stage: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"), "n_users"
        )

    return (
        _count(v, "1_view")
        .unionAll(_count(c, "2_click"))
        .unionAll(_count(p, "3_purchase"))
    )


# ---------------------------------------------------------------------------
# Native session windows (F.session_window in batch mode)
# ---------------------------------------------------------------------------


@register(
    "events_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, sid
""",
    survey=["session-window", "streaming-batch", "window"],
    bench=True,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``session_window`` aggregate
    (the same operator Structured Streaming uses for stateful session
    aggregation, here in batch mode). Unlike the gaps-and-islands
    formulation (``events_sessionize``: two window passes + final agg =
    one sort-shuffle reused three times), session_window is a single
    special-purpose aggregate: partial session merge map-side, one
    exchange keyed user_id, final merge -- the plan Spark picks for
    session semantics at any scale.

    Tie semantics: session_window merges an event iff it starts strictly
    before previous_end = prev_ts + 30min, so a gap of exactly 30:00
    starts a NEW session (the oracle's ``>=``); the gaps-and-islands twin
    uses ``>`` (merge on exact tie) -- both are valid conventions,
    documented here because they differ.
    """
    ev = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# CDC changelog compaction: latest state per key
# ---------------------------------------------------------------------------


@register(
    "cdc_latest_state",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, ts, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, ts AS latest_ts, value AS latest_value,
       event_id AS latest_event_id
FROM ranked WHERE rn = 1
""",
    survey=["cdc-compaction", "dedup-exact", "window"],
)
def cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: the LATEST row per (user_id, event_type) --
    how a CDC/upsert feed collapses to current state before a warehouse
    merge. Deterministic tiebreak (ts, event_id) descending.

    Scale note: row_number-over-window sorts only within each hash
    partition of the key (no global sort), and at 100 TB the same
    semantics can run as a partial ``max_by(struct(...))`` hash
    aggregate (map-side combine, no sort at all); the window form is
    kept because it extends to top-N-per-key unchanged."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.col("value").alias("latest_value"),
            F.col("event_id").alias("latest_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# OHLC time-series resample (open/high/low/close per window)
# ---------------------------------------------------------------------------


def _checked_event_id(allow_negative: bool = False):
    """event_id with the packed-ordering-key precondition enforced:
    the OHLC min_by/max_by trick packs (within-hour us offset) * 2^31
    + event_id into one long, which is only order-preserving while
    event_id < 2^31.  Beyond that the open/close picks would silently
    diverge from (ts ASC, event_id ASC) — so raise loudly instead
    (round-9 ADVICE).  Shared by the batch twin and the stream job;
    the stream passes allow_negative=True because its watermark
    sentinel rows carry negative ids and never reach the sink (their
    future windows are filtered), so only the upper bound matters."""
    lower = (
        F.lit(True) if allow_negative else (F.col("event_id") >= 0)
    )
    return F.when(
        lower & (F.col("event_id") < 2147483648),
        F.col("event_id"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("ohlc packed ordering key requires event_id"
                      " < 2^31, got "),
                F.col("event_id").cast("string"),
            )
        ).cast("long")
    )


@register(
    "events_ohlc_hourly",
    oracle="""
WITH r AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour_start, value,
         ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, DATE_TRUNC('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT event_type, hour_start,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n_events
FROM r
GROUP BY event_type, hour_start
""",
    survey=["ohlc", "resample", "time-series", "G3"],
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resample: open/high/low/close of ``value`` per (event_type,
    hour) -- the time-series downsampling shape (financial bars, metric
    rollups). Spark side is a SINGLE hash aggregate using min_by/max_by
    with a packed-long ordering key (deterministic (ts, event_id)
    tiebreak): partial aggregates carry one candidate value per group
    per task, so the exchange is group-count-sized and there is NO sort
    anywhere -- vs the oracle's two-window formulation, which sorts
    each partition twice. At 100 TB this is the difference between a
    mergeable aggregation tree and a per-group sort."""
    ev = load(spark, sf_dir, "events")
    hour = F.date_trunc("hour", "ts")
    # (ts, event_id) tiebreak packed into ONE long: a struct ordering key
    # would force SortAggregate (struct agg buffers are not mutable), so
    # encode the within-hour microsecond offset (< 2^32) shifted left 31
    # bits plus event_id (< 2^31): max 3.6e9 * 2^31 + 2^31 ~ 7.7e18 < 2^63.
    # Long buffer -> partial+final HashAggregate, no sort at all.
    # PRECONDITION: event_id < 2^31, or the packed key collides across
    # microseconds and open/close picks silently diverge from the
    # (ts, event_id) order — so the guard raises instead (row-local
    # branch, stays inside codegen; no extra scan).
    ordk = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(hour))
        * F.lit(2147483648).cast("long")
        + _checked_event_id()
    )
    return (
        ev.groupBy("event_type", hour.alias("hour_start"))
        .agg(
            F.min_by("value", ordk).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordk).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: median/MAD per event type
# ---------------------------------------------------------------------------

_MAD_K = 3.0


@register(
    "events_mad_outliers",
    oracle=f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS median_val
  FROM events GROUP BY event_type
),
mad AS (
  SELECT e.event_type, m.median_val,
         quantile_cont(ABS(e.value - m.median_val), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type, m.median_val
)
SELECT e.event_type, a.median_val, a.mad,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE ABS(e.value - a.median_val)
                        > {_MAD_K} * a.mad) AS n_outliers
FROM events e JOIN mad a USING (event_type)
GROUP BY e.event_type, a.median_val, a.mad
""",
    survey=["outlier-detection", "mad", "robust-stats", "percentile"],
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection per event type: flag values
    more than 3 median-absolute-deviations from their group median --
    the quality gate that survives heavy-tailed data where mean/stddev
    thresholds drown (a single huge value inflates sigma but not MAD).

    Two exact-percentile passes over the same grouping key; each
    per-group scalar result broadcasts back onto the scan, so the fact
    table is read-shuffled only for the percentile sorts. Both engines
    interpolate percentiles with the identical arithmetic, so the
    thresholds -- and therefore every flag -- agree exactly. At 100 TB
    substitute approx_percentile (mergeable sketch) for the same plan
    minus the per-group sorts."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("median_val")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "median_val")
        .agg(
            F.percentile(
                F.abs(F.col("value") - F.col("median_val")), F.lit(0.5)
            ).alias("mad")
        )
    )
    dev = F.abs(F.col("value") - F.col("median_val"))
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "median_val", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(dev > _MAD_K * F.col("mad"), 1)).alias(
                "n_outliers"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Weighted moving average over each user's event sequence
# ---------------------------------------------------------------------------

_WMA_WEIGHTS = (5, 4, 3, 2, 1)  # newest -> oldest, denominator 15


@register(
    "events_wma",
    oracle=f"""
WITH s AS (
  SELECT user_id, event_id, value,
         LAG(value, 1) OVER w AS v1,
         LAG(value, 2) OVER w AS v2,
         LAG(value, 3) OVER w AS v3,
         LAG(value, 4) OVER w AS v4,
         ROW_NUMBER() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       (FLOOR(((5*value + 4*v1 + 3*v2 + 2*v3 + 1*v4) / 15) * 10000 + 0.5)
        / 10000) AS wma
FROM s WHERE rn >= 5
""",
    survey=["moving-average", "window-frame", "time-series"],
)
def events_wma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted moving average (weights 5..1 over the last five events)
    of each user's value sequence in event-time order -- the smoothing
    pass a feature pipeline applies before change detection. Rows
    before a full window are withheld (rn >= 5), so every output is a
    fully-weighted average.

    One window pass: a single hash-partition by user_id with an
    in-partition sort evaluates all four LAGs and the row counter
    together; the arithmetic is a fixed IEEE sequence (integer-weighted
    products, one division), identical in any engine. Scale: state per
    group is O(window), and user_id is high-cardinality uniform."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [F.lag("value", i).over(w) for i in range(1, 5)]
    num = sum(F.lit(wt) * c for wt, c in zip(_WMA_WEIGHTS, lags))
    return (
        ev.select(
            "user_id",
            "event_id",
            (num / F.lit(15)).alias("raw_wma"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") >= 5)
        .select("user_id", "event_id", dround(F.col("raw_wma"), 4).alias("wma"))
    )


# ---------------------------------------------------------------------------
# VARIANT ingestion: parse_json once, typed extraction downstream
# ---------------------------------------------------------------------------


@register(
    "events_variant_buckets",
    oracle="""
WITH x AS (
  SELECT event_type,
         TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type, k % 10 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS k_sum
FROM x WHERE k IS NOT NULL
GROUP BY event_type, k % 10
""",
    survey=["json", "variant", "semi-structured"],
)
def events_variant_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion on the Spark 4 VARIANT type: the props
    string is parsed ONCE with ``parse_json`` into an open-schema
    variant value, and every downstream access is a typed
    ``try_variant_get`` path extraction -- the modern replacement for
    repeated ``get_json_object`` string re-parsing (the binary variant
    encoding is decoded per path, not re-tokenized per access).

    Scale shape: parse + extraction are per-row column work fused into
    the scan projection; the rollup is one map-side-combinable hash
    aggregate on (event_type, bucket). At 100 TB VARIANT's shredded
    parquet storage lets the path extraction push into the scan."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
        )
    )


# ---------------------------------------------------------------------------
# Gap-fill / resample: dense hourly grid with zero- and forward-fill
# ---------------------------------------------------------------------------


@register(
    "events_gapfill_hourly",
    oracle="""
WITH hourly AS (
  SELECT event_type, DATE_TRUNC('hour', ts) AS hour_start,
         COUNT(*) AS n,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS value_cents
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT MIN(hour_start) AS lo, MAX(hour_start) AS hi FROM hourly
),
grid AS (
  SELECT t.event_type, g.h AS hour_start
  FROM (SELECT DISTINCT event_type FROM hourly) t
  CROSS JOIN (
    SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
  ) g
),
joined AS (
  SELECT g.event_type, g.hour_start,
         COALESCE(h.n, 0) AS n,
         h.value_cents AS raw_cents
  FROM grid g LEFT JOIN hourly h
    ON g.event_type = h.event_type AND g.hour_start = h.hour_start
)
SELECT event_type, hour_start, CAST(n AS BIGINT) AS n,
       CAST(COALESCE(LAST_VALUE(raw_cents IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY hour_start), 0) AS BIGINT)
         AS filled_cents
FROM joined
""",
    survey=["gap-fill", "resample", "time-series", "window"],
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap-fill: densify the hourly rollup onto a complete
    per-type hour grid (``sequence`` generates the grid JVM-side), then
    zero-fill counts and forward-fill the last observed hourly value --
    the resample/densify pass feature-store pipelines need before any
    lag/rolling computation, and one Spark has no built-in for.

    Engine-exactness: values aggregate as integer cents, so fills are
    integer-exact.

    Scale shape: the rollup is the usual map-side-combinable aggregate;
    the grid generates from a broadcast 1-row bounds scalar (never a
    driver loop); the forward-fill window partitions by series key --
    at 100 TB that is millions of independent series, so the window
    parallelizes per key (the 5-type demo grain understates the
    real-world key cardinality, not the plan)."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents).alias("raw_cents"),
    )
    bounds = hourly.agg(
        F.min("hour_start").alias("lo"), F.max("hour_start").alias("hi")
    )
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour_start"),
        )
    )
    joined = grid.join(hourly, ["event_type", "hour_start"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "hour_start",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(
            F.last("raw_cents", ignorenulls=True).over(w), F.lit(0)
        ).alias("filled_cents"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimation with mergeable integer counters
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
_CMS_W = 64  # buckets per row
_CMS_PROBES = (1, 42, 101, 500, 999)


def _cms_hash_sql(d: str, key: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5(concat(CAST({d} AS VARCHAR), ':', "
        f"CAST({key} AS VARCHAR))), 1, 15)) AS BIGINT) % {_CMS_W}"
    )


CMS_SQL = f"""
WITH rows_d AS (SELECT UNNEST([0, 1, 2, 3]) AS d),
cells AS (
  SELECT r.d, {_cms_hash_sql('r.d', 'e.user_id')} AS bucket, COUNT(*) AS n
  FROM events e CROSS JOIN rows_d r
  GROUP BY 1, 2
),
probes AS (SELECT UNNEST([{', '.join(str(p) for p in _CMS_PROBES)}]) AS user_id),
est AS (
  SELECT p.user_id, CAST(MIN(c.n) AS BIGINT) AS cms_est
  FROM probes p
  CROSS JOIN rows_d r
  JOIN cells c ON c.d = r.d AND c.bucket = {_cms_hash_sql('r.d', 'p.user_id')}
  GROUP BY p.user_id
),
exact AS (
  SELECT user_id, COUNT(*) AS exact_n FROM events
  WHERE user_id IN ({', '.join(str(p) for p in _CMS_PROBES)})
  GROUP BY user_id
)
SELECT e.user_id, CAST(COALESCE(x.exact_n, 0) AS BIGINT) AS exact_n, e.cms_est
FROM est e LEFT JOIN exact x ON e.user_id = x.user_id
"""


@register(
    "events_cms_freq",
    oracle=CMS_SQL,
    survey=["approx-sketch", "count-min", "frequency"],
)
def events_cms_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation: a {_CMS_D}x{_CMS_W} grid of
    integer counters (md5-derived row hashes, identical in both
    engines), probed for a fixed key set with the min-over-rows
    estimate next to the exact count -- the mergeable heavy-hitter
    sketch that answers per-key frequencies at 100 TB without carrying
    raw keys. Unlike the engine-opaque HLL binary, CMS is pure integer
    arithmetic, so the whole sketch is hash-checkable cross-engine.

    Scale shape: the build is one map-side-combinable aggregate over
    (d, bucket) -- {_CMS_D * _CMS_W} cells total regardless of input
    size, the textbook mergeable-sketch bound; daily cell grids ADD
    (CMS is a linear sketch), giving incremental maintenance by integer
    addition. Probing joins the tiny cell table broadcast."""
    ev = load(spark, sf_dir, "events")
    d_col = F.explode(F.array(*[F.lit(d) for d in range(_CMS_D)])).alias("d")
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("d").cast("string"),
                        F.lit(":"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )
    cells = (
        ev.select("user_id", d_col)
        .select("d", bucket.alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    probes = ev.sparkSession.createDataFrame(
        [(p,) for p in _CMS_PROBES], "user_id LONG"
    )
    probe_cells = probes.select(
        "user_id", F.explode(F.array(*[F.lit(d) for d in range(_CMS_D)])).alias("d")
    ).select(
        "user_id",
        "d",
        bucket.alias("bucket"),
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id")
        .agg(F.min("n").alias("cms_est"))
    )
    exact = (
        ev.filter(F.col("user_id").isin(*_CMS_PROBES))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return est.join(exact, "user_id", "left").select(
        "user_id",
        F.coalesce(F.col("exact_n"), F.lit(0)).alias("exact_n"),
        "cms_est",
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) event-time window: 1 h duration, 15 min slide
# ---------------------------------------------------------------------------

HOPPING_SQL = """
WITH hops AS (
  SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k * INTERVAL 15 MINUTE
           AS hop_start,
         user_id
  FROM events CROSS JOIN (SELECT UNNEST(range(4)) AS k)
)
SELECT hop_start,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM hops
GROUP BY hop_start
"""


@register(
    "events_hopping_window",
    oracle=HOPPING_SQL,
    survey=["streaming-batch", "hopping-window", "G3"],
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 1-hour windows sliding every 15 minutes -- the batch
    expression of ``F.window(ts, "1 hour", "15 minutes")``; each event
    lands in exactly 4 hops.

    Scale: Spark expands each row into its 4 windows before a single
    hash aggregate on (window, ...) -- a constant 4x row blowup with
    map-side partial aggregation, no extra shuffle vs a tumbling window.
    The DuckDB oracle materializes the same expansion with an explicit
    range(4) cross join (every hop containing ts is bucket15(ts) - k*15m
    for k in 0..3, all within (ts - 1h, ts] by construction).
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("hop_start"),
            "n_events",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# Peak concurrency (sweep-line over fixed-TTL intervals)
# ---------------------------------------------------------------------------

_CONC_TTL_MIN = 5

CONCURRENCY_SQL = f"""
WITH pts AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL {_CONC_TTL_MIN} MINUTE AS t, -1 AS delta
  FROM events
), run AS (
  SELECT event_type,
         CAST(SUM(delta) OVER (
           PARTITION BY event_type ORDER BY t, delta
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS conc
  FROM pts
)
SELECT event_type, MAX(conc) AS peak_concurrent
FROM run GROUP BY event_type
"""


@register(
    "events_peak_concurrency",
    oracle=CONCURRENCY_SQL,
    survey=["sweep-line", "interval", "window"],
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously-live events per type, where each
    event is live for a fixed 5-minute TTL: classic sweep-line --
    +1/-1 boundary points, a running sum ordered by (time, delta), and
    a max per type. Ordering -1 before +1 at equal timestamps makes the
    interval half-open [ts, ts+TTL).

    Scale: one shuffle on event_type (the window partition key); the
    running sum is ROWS-framed so it streams in one pass per partition.
    Ties inside an equal (t, delta) group contribute a deterministic
    set of partial sums regardless of intra-group order, so the MAX is
    engine-stable. For a skewed single-type table, salt by time-range
    chunks and stitch boundary offsets (same histogram-offset pattern
    as vocab_build).
    """
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr(f"INTERVAL {_CONC_TTL_MIN} MINUTES")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pts.select("event_type", F.sum("delta").over(w).alias("conc"))
        .groupBy("event_type")
        .agg(F.max("conc").alias("peak_concurrent"))
    )


# ---------------------------------------------------------------------------
# Trailing time-range window (RANGE frame, not ROWS)
# ---------------------------------------------------------------------------

TRAILING_1H_SQL = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) OVER w
         AS BIGINT) AS value_micro_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
"""


@register(
    "events_trailing_1h",
    oracle=TRAILING_1H_SQL,
    survey=["window", "range-frame", "streaming-batch"],
    bench=True,
)
def events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing one-hour activity: count and exact micro-unit
    value sum of the same user's events in (ts - 1h, ts] via a RANGE
    frame over epoch microseconds -- the value-based frame ROWS cannot
    express (events are irregularly spaced). Events sharing a timestamp
    share a frame, so the result is order-independent within ties.

    Scale: one shuffle on user_id; the range frame is evaluated with a
    sliding two-pointer pass per partition, O(n) amortized, no
    re-aggregation per row."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    micro = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("bigint")
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(micro).over(w).cast("bigint").alias("value_micro_1h"),
    )


# ---------------------------------------------------------------------------
# Purchase attribution (first- and last-touch within a lookback window)
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback
_ATTR_TOUCHES = ("click", "view")

ATTRIBUTION_SQL = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us
  FROM events
),
w AS (
  SELECT event_type, value,
         MIN(CASE WHEN event_type IN ('click', 'view')
                  THEN printf('%020d|%010d|%s', us, event_id, event_type)
             END) OVER fr AS first_s,
         MAX(CASE WHEN event_type IN ('click', 'view')
                  THEN printf('%020d|%010d|%s', us, event_id, event_type)
             END) OVER fr AS last_s
  FROM e
  WINDOW fr AS (
    PARTITION BY user_id ORDER BY us
    RANGE BETWEEN {_ATTR_LOOKBACK_US} PRECEDING AND 1 PRECEDING
  )
),
p AS (SELECT * FROM w WHERE event_type = 'purchase'),
x AS (
  SELECT 'first' AS position,
         COALESCE(string_split(first_s, '|')[3], 'none') AS touch_type,
         value
  FROM p
  UNION ALL
  SELECT 'last' AS position,
         COALESCE(string_split(last_s, '|')[3], 'none') AS touch_type,
         value
  FROM p
)
SELECT position, touch_type,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_micro
FROM x
GROUP BY position, touch_type
"""


@register(
    "events_attribution",
    oracle=ATTRIBUTION_SQL,
    survey=["attribution", "window", "range-frame", "funnel", "events"],
    bench=True,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First- and last-touch purchase attribution: every purchase
    credits the user's EARLIEST and LATEST touch (click/view) in the
    strictly-preceding 7-day lookback, and the report totals purchases
    and exact micro-unit revenue per (position, touch type) — with
    'none' rows for purchases no touch preceded (the unattributable
    remainder an attribution dashboard must not silently drop).

    Both touches come from ONE user-keyed RANGE window pass (the
    events_trailing_1h frame discipline): MIN/MAX over a sortable
    fixed-width '(us)|(event_id)|type' encoding inside the
    [ts-7d, ts) frame — no self-join, no per-purchase scan, and the
    string encoding makes the in-frame argmin/argmax identical in
    both engines (zero-padded lexicographic = numeric order, event_id
    tie-break included). One shuffle on user_id; the frame is a
    two-pointer pass per partition; output is bounded by
    2 x (|touch types| + 1) rows.

    At 100 TB this is the attribution shape that replaces the naive
    purchases-to-touches interval join (which re-shuffles touches per
    purchase and skews on hot users): the window pass reads each event
    once, and a streaming twin would carry the same frame as
    applyInPandasWithState state."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    enc = F.when(
        F.col("event_type").isin(*_ATTR_TOUCHES),
        F.format_string(
            "%020d|%010d|%s", us, F.col("event_id"), F.col("event_type")
        ),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    w = ev.select(
        "event_type",
        "value",
        F.min(enc).over(fr).alias("first_s"),
        F.max(enc).over(fr).alias("last_s"),
    ).filter(F.col("event_type") == "purchase")
    touch = lambda col: F.coalesce(  # noqa: E731
        F.element_at(F.split(F.col(col), "\\|"), 3), F.lit("none")
    )
    x = w.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("first").alias("position"),
                    touch("first_s").alias("touch_type"),
                ),
                F.struct(
                    F.lit("last").alias("position"),
                    touch("last_s").alias("touch_type"),
                ),
            )
        ).alias("a"),
        "value",
    ).select("a.position", "a.touch_type", "value")
    micro = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("bigint")
    return x.groupBy("position", "touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum(micro).cast("long").alias("value_micro"),
    )


# ---------------------------------------------------------------------------
# User-journey transition matrix (Markov next-event probabilities)
# ---------------------------------------------------------------------------

TRANSITIONS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS cur,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
pairs AS (
  SELECT cur, nxt, COUNT(*) AS n_pair
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
),
totals AS (SELECT cur, SUM(n_pair) AS n_cur FROM pairs GROUP BY cur)
SELECT p.cur, p.nxt, p.n_pair,
       CAST(p.n_pair AS DOUBLE) / t.n_cur AS p_next
FROM pairs p JOIN totals t ON p.cur = t.cur
"""


@register(
    "event_transitions",
    oracle=TRANSITIONS_SQL,
    survey=["markov", "user-journey", "window", "lead"],
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event journeys:
    lead() pairs each event with the user's next event, pair counts
    normalize to P(next | current) by single IEEE divisions of exact
    counts (engine-identical doubles).

    Scale: one shuffle on user_id for the lead window; the pair/total
    aggregates are event-type-cardinality-sized (tiny) and the totals
    join broadcasts."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n_pair"))
    totals = pairs.groupBy("cur").agg(F.sum("n_pair").alias("n_cur"))
    return pairs.join(F.broadcast(totals), "cur").select(
        "cur",
        "nxt",
        "n_pair",
        (F.col("n_pair").cast("double") / F.col("n_cur")).alias("p_next"),
    )


# ---------------------------------------------------------------------------
# Null-safe equality join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------

NULLSAFE_JOIN_SQL = """
WITH a AS (
  SELECT NULLIF(user_id % 50, 0) AS k, COUNT(*) AS n_a
  FROM events WHERE event_type = 'view' GROUP BY 1
),
b AS (
  SELECT NULLIF(user_id % 50, 0) AS k, COUNT(*) AS n_b
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT a.k, a.n_a, b.n_b
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
"""


@register(
    "events_nullsafe_join",
    oracle=NULLSAFE_JOIN_SQL,
    survey=["join-nullsafe", "semantics"],
)
def events_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (Spark ``eqNullSafe`` / SQL ``<=>``): the
    NULL bucket (user_id % 50 == 0, nulled via NULLIF) joins to itself
    instead of being dropped as it would be under ``=``. The semantics
    every keyed backfill needs when the key is nullable -- and a
    one-row-different result from the plain join, so the hash check
    pins the distinction.

    Scale: Spark plans <=> as an ordinary hash join with the null bucket
    as a regular key value (no skew concern beyond the bucket's own
    size)."""
    ev = load(spark, sf_dir, "events")
    k = F.nullif(F.col("user_id") % 50, F.lit(0)).alias("k")
    a = (
        ev.filter(F.col("event_type") == "view")
        .select(k)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select(k)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(
        a["k"].alias("k"), "n_a", "n_b"
    )


# ---------------------------------------------------------------------------
# Day-of-week x hour activity heatmap (engine-portable dow arithmetic)
# ---------------------------------------------------------------------------

HEATMAP_SQL = """
SELECT (DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
         AS dow,
       EXTRACT(hour FROM ts) AS hour_of_day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


@register(
    "events_dow_hour_heatmap",
    oracle=HEATMAP_SQL,
    survey=["heatmap", "date-part", "P13-family"],
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity heatmap by (day-of-week, hour-of-day). The dow is
    computed as (days_since_epoch + 4) % 7 (epoch day zero was a
    Thursday; 0 = Sunday) because engines disagree on dayofweek
    numbering (Spark 1=Sunday, DuckDB dow 0=Sunday, ISO 1=Monday) --
    integer arithmetic sidesteps the convention entirely, the P13
    date-part-suite lesson (reference defect D5) applied cross-engine.

    Scale: one aggregate over a 7x24 key space, map-side combinable."""
    ev = load(spark, sf_dir, "events")
    dow = (
        (F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")) + 4) % 7
    ).alias("dow")
    return ev.groupBy(dow, F.hour("ts").alias("hour_of_day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Next-day retention (DAU returning the following day)
# ---------------------------------------------------------------------------

RETENTION_SQL = """
WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
ret AS (
  SELECT a.d, COUNT(*) AS dau,
         COUNT(b.user_id) AS returned
  FROM du a LEFT JOIN du b
    ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
  GROUP BY a.d
)
SELECT d, dau, returned,
       CAST(returned AS DOUBLE) / dau AS d1_retention
FROM ret
"""


@register(
    "events_d1_retention",
    oracle=RETENTION_SQL,
    survey=["retention", "self-join", "kpi"],
)
def events_d1_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-1 retention: of each day's active users, the share active
    again the next day -- the product KPI behind every cohort chart.
    Exact-count ratio via one IEEE division.

    Scale: the (day, user) distinct is one shuffle; the self-join keys
    on user_id (co-partitioned with the distinct's output), so the
    retention pass adds no new wide exchange at scale when the activity
    table is bucketed by user."""
    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.to_date("ts").alias("d"), "user_id"
    ).distinct()
    a, b = du.alias("a"), du.alias("b")
    ret = (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.d") == F.date_add(F.col("a.d"), 1)),
            "left",
        )
        .groupBy(F.col("a.d").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("dau"),
            F.count(F.col("b.user_id")).alias("returned"),
        )
    )
    return ret.select(
        "d",
        "dau",
        "returned",
        (F.col("returned").cast("double") / F.col("dau")).alias("d1_retention"),
    )


# ---------------------------------------------------------------------------
# HDR-style log-bucketed percentiles (mergeable, integer-exact)
# ---------------------------------------------------------------------------

HDR_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS micro
  FROM events WHERE value > 0
),
b AS (
  SELECT event_type,
         LENGTH(format('{:b}', micro)) - 1 AS bucket,
         COUNT(*) AS n
  FROM m GROUP BY 1, 2
),
c AS (
  SELECT event_type, bucket, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM b
)
SELECT event_type,
       CAST(MIN(CASE WHEN cum * 2 >= total THEN bucket END) AS INT)
         AS p50_bucket,
       CAST(MIN(CASE WHEN cum * 20 >= total * 19 THEN bucket END) AS INT)
         AS p95_bucket,
       CAST(MIN(CASE WHEN cum * 100 >= total * 99 THEN bucket END) AS INT)
         AS p99_bucket,
       CAST(MAX(total) AS BIGINT) AS n_events
FROM c GROUP BY event_type
"""


@register(
    "events_hdr_percentiles",
    oracle=HDR_SQL,
    survey=["percentile-sketch", "hdr-histogram", "mergeable"],
)
def events_hdr_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HDR-histogram-style percentiles: values bucket by the bit length
    of their integer micro representation (log2 buckets, <=2x relative
    error), cumulative counts locate p50/p95/p99 buckets with integer
    threshold tests. This is the MERGEABLE percentile path for 100 TB --
    per-partition bucket counts combine map-side (unlike exact
    percentiles, which sort), daily histograms merge by addition, and
    nothing in the pipeline touches a float.

    The exact twin is price_percentiles; this one trades bounded
    relative error for a shuffle payload of ~40 buckets per key."""
    ev = load(spark, sf_dir, "events")
    micro = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("bigint")
    b = (
        ev.filter(F.col("value") > 0)
        .select("event_type", micro.alias("micro"))
        .select(
            "event_type",
            (F.length(F.expr("bin(micro)")) - 1).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    c = b.select(
        "event_type",
        "bucket",
        F.sum("n").over(wcum).alias("cum"),
        F.sum("n").over(wall).alias("total"),
    )

    def pick(mult_c: int, mult_t: int):
        return F.min(
            F.when(F.col("cum") * mult_c >= F.col("total") * mult_t, F.col("bucket"))
        ).cast("int")

    return c.groupBy("event_type").agg(
        pick(2, 1).alias("p50_bucket"),
        pick(20, 19).alias("p95_bucket"),
        pick(100, 99).alias("p99_bucket"),
        F.max("total").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Dynamic-gap session windows (per-event-type inactivity horizon)
# ---------------------------------------------------------------------------

_DYN_GAP_PURCHASE_US = 600_000_000  # 10 min after a purchase
_DYN_GAP_DEFAULT_US = 1_800_000_000  # 30 min otherwise

DYNAMIC_SESSIONS_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t_us,
         epoch_us(ts) + CASE WHEN event_type = 'purchase'
                             THEN {_DYN_GAP_PURCHASE_US}
                             ELSE {_DYN_GAP_DEFAULT_US} END AS end_us
  FROM events
),
flagged AS (
  SELECT user_id, event_id, t_us, end_us,
         CASE WHEN MAX(end_us) OVER (
                PARTITION BY user_id ORDER BY t_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR t_us >= MAX(end_us) OVER (
                PARTITION BY user_id ORDER BY t_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
sessions AS (
  SELECT user_id, t_us, end_us,
         CAST(SUM(new_sess) OVER (
           PARTITION BY user_id ORDER BY t_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS sid
  FROM flagged
)
SELECT user_id,
       COUNT(*) AS n_events,
       make_timestamp(MIN(t_us)) AS session_start,
       make_timestamp(MAX(end_us)) AS session_end
FROM sessions
GROUP BY user_id, sid
"""


@register(
    "events_dynamic_sessions",
    oracle=DYNAMIC_SESSIONS_SQL,
    survey=["session-window", "dynamic-gap", "streaming-twin", "windows"],
)
def events_dynamic_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows whose inactivity gap depends on the EVENT — 10
    minutes after a purchase (intent completed), 30 minutes otherwise —
    via ``session_window``'s dynamic gap-duration column. Fixed-gap
    sessionization (events_session_window / events_sessionize) can't
    express this; the per-event horizon is what real engagement
    analytics uses.

    The oracle is the sweep-line formulation: each event claims
    [t, t+gap(type)); a session breaks where an event starts at-or-
    after the running max end of everything before it. Integer
    microseconds end-to-end, so both engines agree exactly.

    Scale shape: one shuffle on user_id; Spark's native session_window
    does the merge inside the aggregate (streaming-ready — the same
    expression works under a watermark in streaming mode); the oracle's
    running-max window is the batch equivalent."""
    ev = load(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase",
        F.lit(f"{_DYN_GAP_PURCHASE_US // 1_000_000} seconds"),
    ).otherwise(F.lit(f"{_DYN_GAP_DEFAULT_US // 1_000_000} seconds"))
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
        )
    )


# ---------------------------------------------------------------------------
# Population Stability Index: distribution drift between time halves
# ---------------------------------------------------------------------------

PSI_SQL = """
WITH mid AS (
  SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT) AS m
  FROM events
),
tagged AS (
  SELECT e.event_type,
         CASE WHEN epoch_us(e.ts) < mid.m THEN 'ref' ELSE 'cur' END AS half
  FROM events e, mid
),
counts AS (
  SELECT event_type,
         CAST(SUM(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ref,
         CAST(SUM(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cur
  FROM tagged GROUP BY event_type
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         CAST(SUM(n_cur) AS BIGINT) AS t_cur
  FROM counts
),
terms AS (
  SELECT c.event_type, c.n_ref, c.n_cur,
         CAST(FLOOR(
           (CAST(c.n_ref + 1 AS DOUBLE) / (tot.t_ref + 1)
            - CAST(c.n_cur + 1 AS DOUBLE) / (tot.t_cur + 1))
           * LN((CAST(c.n_ref + 1 AS DOUBLE) / (tot.t_ref + 1))
                / (CAST(c.n_cur + 1 AS DOUBLE) / (tot.t_cur + 1)))
           * 1000000000 + 0.5) AS BIGINT) AS psi_term_nano
  FROM counts c, tot
)
SELECT event_type, n_ref, n_cur, psi_term_nano
FROM terms
"""


@register(
    "events_psi_drift",
    oracle=PSI_SQL,
    survey=["psi", "drift-monitoring", "statistics", "ml-ops"],
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second time
    half of the event stream, per event_type — THE production drift
    monitor for models and pipelines (PSI > 0.1 = investigate,
    > 0.25 = retrain/requeue): psi = sum over buckets of
    (p_ref - p_cur) * ln(p_ref / p_cur), emitted per bucket so the
    drifting categories are identifiable, with add-one smoothing so an
    empty bucket never produces an infinite term.

    Exactness: proportions are exact-integer ratios in DOUBLE (one
    fixed IEEE sequence), the ln() term is floor-quantized to nano
    units per bucket — the doc_unigram_logprob discipline — so
    summing terms downstream is order-independent; the midpoint split
    is pure integer microsecond arithmetic (unix_micros / epoch_us) —
    interval division differs across engines and bit one attempt.

    Scale shape: one scan tags halves against a broadcast 1-row
    min/max; bucket counts are one map-combinable aggregate over
    event_type; totals are a second tiny aggregate broadcast back.
    For continuous features the same shape runs over decile buckets
    (order_price_deciles' histogram-offset construction)."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.floor(
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2
        )
        .cast("long")
        .alias("m")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.when(F.unix_micros("ts") < F.col("m"), F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("half"),
    )
    counts = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == "ref", 1).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(F.col("half") == "cur", 1).otherwise(0))
        .cast("long")
        .alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    p_ref = (F.col("n_ref") + 1).cast("double") / (F.col("t_ref") + 1)
    p_cur = (F.col("n_cur") + 1).cast("double") / (F.col("t_cur") + 1)
    term = (
        F.floor(
            (p_ref - p_cur) * F.log(p_ref / p_cur) * 1000000000
            + F.lit(0.5)
        )
    ).cast("long")
    return counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_ref",
        "n_cur",
        term.alias("psi_term_nano"),
    )


# ---------------------------------------------------------------------------
# Hourly behavioral entropy of the event-type mix
# ---------------------------------------------------------------------------

ENTROPY_SQL = """
WITH c AS (
  SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT hour_start, CAST(SUM(n) AS BIGINT) AS t
  FROM c GROUP BY hour_start
)
SELECT c.hour_start,
       tot.t AS n_events,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(CAST(FLOOR(
           -(CAST(c.n AS DOUBLE) / tot.t)
             * LN(CAST(c.n AS DOUBLE) / tot.t) * 1000000000 + 0.5)
         AS BIGINT)) AS BIGINT) AS entropy_nano
FROM c JOIN tot ON c.hour_start = tot.hour_start
GROUP BY c.hour_start, tot.t
"""


@register(
    "events_entropy_hourly",
    oracle=ENTROPY_SQL,
    survey=["entropy", "statistics", "behavior", "drift-monitoring"],
)
def events_entropy_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-type mix per hour — the behavioral
    health metric dashboards track beside volume (entropy collapse =
    one event type flooding, e.g. a retry storm or a dead product
    surface; a rise = mix shift feeding events_psi_drift's deeper
    check).

    Exactness: each -p*ln(p) term is floor-quantized to nano units
    BEFORE the per-hour sum (order-independent), p itself an exact
    integer ratio in one double division.

    Scale shape: (hour, type) counts map-combine; hour totals ride a
    second tiny aggregate joined back on the hour key; the term sum
    re-uses the same hour partitioning — no window, no sort."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    tot = c.groupBy("hour_start").agg(F.sum("n").cast("long").alias("t"))
    p = F.col("n").cast("double") / F.col("t")
    term = F.floor(-p * F.log(p) * 1000000000 + F.lit(0.5)).cast("long")
    return (
        c.join(tot, "hour_start")
        .groupBy("hour_start", F.col("t").alias("n_events"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(term).cast("long").alias("entropy_nano"),
        )
        .select("hour_start", "n_events", "n_types", "entropy_nano")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint scan over hourly event volume
# ---------------------------------------------------------------------------

CUSUM_SQL = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS hour_start,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
mu AS (
  SELECT CAST(SUM(n) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS h
  FROM hourly
),
dev AS (
  SELECT hourly.hour_start, hourly.n,
         CAST(hourly.n * mu.h - mu.tot AS BIGINT) AS dev_h
  FROM hourly, mu
),
cum AS (
  SELECT hour_start, n, dev_h,
         CAST(SUM(dev_h) OVER (ORDER BY hour_start) AS BIGINT) AS cusum_h
  FROM dev
),
peak AS (
  SELECT MAX(ABS(cusum_h)) AS m FROM cum
)
SELECT cum.hour_start, cum.n, cum.cusum_h,
       ABS(cum.cusum_h) = peak.m AS is_changepoint
FROM cum, peak
"""


@register(
    "events_cusum_changepoint",
    oracle=CUSUM_SQL,
    survey=["cusum", "changepoint", "time-series", "prefix-sum"],
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over hourly event volume: the running sum
    of deviations from the series mean, whose maximum excursion marks
    the most likely level-shift hour (the classic offline CUSUM
    estimator; ops teams read the flagged hour as "when the incident
    started"). Deviations are kept INTEGER by scaling: dev_h =
    n_t * H - total (each hour's count times hour-count minus the
    grand total = H times the usual n_t - mean), so the cumulative
    sum is exact integer arithmetic — no float drift anywhere.

    Scale shape: the corpus-sized work is the hourly count (one
    map-combinable aggregate); the cumulation runs on the HOURLY SPINE
    (series-length rows, independent of event volume) via the same
    two-level prefix sum as vocab_growth_curve — per-day partitioned
    windows plus one tiny day-offset window — so even a years-long
    spine never funnels through one task unbounded."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    mu = hourly.agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("h"),
    )
    dev = hourly.crossJoin(F.broadcast(mu)).select(
        "hour_start",
        "n",
        (F.col("n") * F.col("h") - F.col("tot")).cast("long").alias("dev_h"),
        F.date_trunc("day", F.col("hour_start")).alias("day"),
    )
    w_in = (
        Window.partitionBy("day")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = dev.select(
        "hour_start",
        "n",
        "dev_h",
        "day",
        F.sum("dev_h").over(w_in).alias("intra"),
    )
    dtot = dev.groupBy("day").agg(F.sum("dev_h").alias("d_dev"))
    w_d = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    offsets = dtot.select(
        "day",
        F.coalesce(F.sum("d_dev").over(w_d), F.lit(0)).alias("off"),
    )
    cum = intra.join(F.broadcast(offsets), "day").select(
        "hour_start",
        "n",
        (F.col("off") + F.col("intra")).cast("long").alias("cusum_h"),
    )
    peak = cum.agg(F.max(F.abs(F.col("cusum_h"))).alias("m"))
    return cum.crossJoin(F.broadcast(peak)).select(
        "hour_start",
        "n",
        "cusum_h",
        (F.abs(F.col("cusum_h")) == F.col("m")).alias("is_changepoint"),
    )


# ---------------------------------------------------------------------------
# Binned two-sample Kolmogorov-Smirnov: value-distribution drift
# ---------------------------------------------------------------------------

_KS_BUCKETS = 32

KS_SQL = f"""
WITH mid AS (
  SELECT CAST((MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS BIGINT) AS m
  FROM events
),
binned AS (
  SELECT CASE WHEN epoch_us(e.ts) < mid.m THEN 'ref' ELSE 'cur' END AS half,
         LEAST(CAST(FLOOR(LN(1.0 + GREATEST(e.value, 0.0))
                          * {_KS_BUCKETS} / 10 + 0.5) AS BIGINT),
               {_KS_BUCKETS - 1}) AS b
  FROM events e, mid
),
counts AS (
  SELECT b,
         CAST(SUM(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ref,
         CAST(SUM(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cur
  FROM binned GROUP BY b
),
tot AS (
  SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref,
         CAST(SUM(n_cur) AS BIGINT) AS t_cur
  FROM counts
),
cum AS (
  SELECT b, n_ref, n_cur,
         CAST(SUM(n_ref) OVER (ORDER BY b) AS BIGINT) AS c_ref,
         CAST(SUM(n_cur) OVER (ORDER BY b) AS BIGINT) AS c_cur
  FROM counts
)
SELECT cum.b, cum.n_ref, cum.n_cur,
       CAST(FLOOR(ABS(CAST(cum.c_ref AS DOUBLE) / tot.t_ref
                      - CAST(cum.c_cur AS DOUBLE) / tot.t_cur)
                  * 1000000000 + 0.5) AS BIGINT) AS ecdf_gap_nano
FROM cum, tot
"""


@register(
    "events_ks_binned",
    oracle=KS_SQL,
    survey=["kolmogorov-smirnov", "drift-monitoring", "statistics"],
)
def events_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov scan of the event VALUE
    distribution between the first and second time half: per log-scale
    bucket, the |ECDF_ref - ECDF_cur| gap (the KS statistic is the max
    over buckets — emitted per bucket so the drifting value range is
    identifiable, complementing events_psi_drift's categorical check
    with a continuous-feature one).

    Exactness: the log bucket index is floor-quantized; the midpoint
    split is integer microseconds; cumulative counts are exact BIGINT
    window sums over the {nb}-bucket spine; each ECDF gap is one fixed
    IEEE sequence floor-quantized to nano.

    Scale shape: corpus-sized work is the (half, bucket) count — one
    map-combinable aggregate; the ECDF cumulation is a window over the
    FIXED {nb}-row bucket spine (bounded by construction, not by data;
    sanctioned class), and totals broadcast back."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.floor(
            (F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2
        )
        .cast("long")
        .alias("m")
    )
    b = F.least(
        F.floor(
            F.log(1.0 + F.greatest(F.col("value"), F.lit(0.0)))
            * _KS_BUCKETS
            / 10
            + F.lit(0.5)
        ).cast("long"),
        F.lit(_KS_BUCKETS - 1),
    )
    binned = ev.crossJoin(F.broadcast(mid)).select(
        F.when(F.unix_micros("ts") < F.col("m"), F.lit("ref"))
        .otherwise(F.lit("cur"))
        .alias("half"),
        b.alias("b"),
    )
    counts = binned.groupBy("b").agg(
        F.sum(F.when(F.col("half") == "ref", 1).otherwise(0))
        .cast("long")
        .alias("n_ref"),
        F.sum(F.when(F.col("half") == "cur", 1).otherwise(0))
        .cast("long")
        .alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").cast("long").alias("t_ref"),
        F.sum("n_cur").cast("long").alias("t_cur"),
    )
    w = Window.orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "b",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w).cast("long").alias("c_ref"),
        F.sum("n_cur").over(w).cast("long").alias("c_cur"),
    )
    gap = F.floor(
        F.abs(
            F.col("c_ref").cast("double") / F.col("t_ref")
            - F.col("c_cur").cast("double") / F.col("t_cur")
        )
        * 1000000000
        + F.lit(0.5)
    ).cast("long")
    return cum.crossJoin(F.broadcast(tot)).select(
        "b", "n_ref", "n_cur", gap.alias("ecdf_gap_nano")
    )


events_ks_binned.__doc__ = events_ks_binned.__doc__.format(nb=_KS_BUCKETS)


# ---------------------------------------------------------------------------
# Poisson anomaly bands over hourly event counts per type
# ---------------------------------------------------------------------------

POISSON_SQL = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
rate AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS tot,
         CAST(COUNT(*) AS BIGINT) AS h
  FROM hourly GROUP BY event_type
)
SELECT hy.hour_start, hy.event_type, hy.n,
       CAST(FLOOR(1000000.0 * rate.tot / rate.h) AS BIGINT)
         AS lambda_micro,
       (CAST(hy.n AS DOUBLE) * rate.h - rate.tot)
         * (CAST(hy.n AS DOUBLE) * rate.h - rate.tot)
         > 9.0 * CAST(rate.tot AS DOUBLE) * rate.h AS is_anomaly
FROM hourly hy JOIN rate ON hy.event_type = rate.event_type
"""


@register(
    "events_poisson_anomaly",
    oracle=POISSON_SQL,
    survey=["poisson", "anomaly-detection", "statistics", "monitoring"],
)
def events_poisson_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson anomaly flags over hourly event counts per type: an
    hour is anomalous when its count leaves the 3-sigma band around
    the type's mean hourly rate — |n - lambda| > 3*sqrt(lambda), the
    count-process counterpart to events_mad_outliers' value check
    (retry storms, outage gaps, bot bursts).

    Exactness: the band test is cleared of division and sqrt by
    cross-multiplication — (n*H - T)^2 > 9*T*H with T = total events
    and H = hours — evaluated in DOUBLE (pure-BIGINT squaring
    overflows int64 once |n*H - T| passes ~3e9 at very large SFs);
    both engines run the identical IEEE sequence over identical
    integer inputs, so the boolean still cannot diverge. The reported
    lambda is an integer-ratio floor.

    Scale shape: two chained map-combinable aggregates ((hour, type)
    then (type)) and a broadcast join of the tiny per-type rate table
    back onto the hourly spine. No window, no sort."""
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    rate = hourly.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("tot"),
        F.count(F.lit(1)).cast("long").alias("h"),
    )
    dev = F.col("n").cast("double") * F.col("h") - F.col("tot")
    return hourly.join(F.broadcast(rate), "event_type").select(
        "hour_start",
        "event_type",
        "n",
        F.floor(F.lit(1000000.0) * F.col("tot") / F.col("h"))
        .cast("long")
        .alias("lambda_micro"),
        (
            dev * dev
            > F.lit(9.0) * F.col("tot").cast("double") * F.col("h")
        ).alias("is_anomaly"),
    )


# ---------------------------------------------------------------------------
# CUPED variance-reduced A/B metric (round 9)
# ---------------------------------------------------------------------------

AB_CUPED_SQL = """
WITH span AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
per_user AS (
  SELECT user_id,
         CASE WHEN substr(md5(concat('ab|', CAST(user_id AS VARCHAR))), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 'A' ELSE 'B' END AS variant,
         COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) <= span.mid
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS x,
         COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) > span.mid
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS y
  FROM events, span
  GROUP BY user_id, span.mid
),
vm AS (
  SELECT variant,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x * x AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(x * y AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM per_user GROUP BY variant
),
pooled AS (
  SELECT SUM(n) AS n, SUM(sx) AS sx, SUM(sy) AS sy,
         SUM(sxx) AS sxx, SUM(sxy) AS sxy, SUM(syy) AS syy
  FROM vm
),
theta AS (
  SELECT n, sx / n AS xbar,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS th,
         ((sxy - sx * sy / n) * (sxy - sx * sy / n))
           / ((sxx - sx * sx / n) * (syy - sy * sy / n)) AS r2
  FROM pooled
)
SELECT vm.variant,
       CAST(vm.n AS BIGINT) AS n_users,
       FLOOR(vm.sy / vm.n * 10000 + 0.5) / 10000 AS mean_y,
       FLOOR((vm.sy - theta.th * (vm.sx - vm.n * theta.xbar)) / vm.n
             * 10000 + 0.5) / 10000 AS mean_y_cuped,
       FLOOR(theta.th * 1000000 + 0.5) / 1000000 AS theta,
       FLOOR(theta.r2 * 1000000 + 0.5) / 1000000 AS var_reduction
FROM vm, theta
ORDER BY vm.variant
"""


@register(
    "ab_cuped_adjusted",
    oracle=AB_CUPED_SQL,
    survey=["ab-testing", "cuped", "variance-reduction", "statistics",
            "normal-equations"],
)
def ab_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted A/B experiment readout (Deng et al., WSDM 2013) —
    the variance-reduction step every large experimentation platform
    applies before the t-test: per-user post-period metric Y is
    shifted by theta * (X - xbar) where X is the PRE-period covariate
    and theta = cov(X,Y)/var(X), the OLS slope. Assignment never
    correlates with X, so the adjustment is mean-preserving per variant
    in expectation while removing the between-user variance X explains
    (reported as r^2 = cov^2/(varX*varY), the exact variance-reduction
    fraction for pooled theta).

    Deterministic by the price_ols2_normal_equations recipe: one
    user-keyed pass builds (X, Y) as exact decimal cents sums, a
    2-row variant aggregate builds decimal-exact raw moments (per-user
    products are exact multiples of 1e-4 with |error| << the scale-4
    cast margin), pooled moments are the SUM of the two variant rows,
    and theta / xbar / the adjusted means are a fixed IEEE op sequence
    on those scalars — identical in both engines, 1e-4/1e-6 floored
    outputs. Variant assignment is the md5-parity hash of the salted
    user id (engine-portable, 50/50).

    Scale shape: ONE corpus pass (user-keyed partial+final agg); the
    experiment readout after it touches 2 rows. theta rides the same
    broadcast-scalar channel the OLS and PCA queries use — no second
    pass over the data to apply the adjustment, because per-variant
    sums suffice: sum(Yc) = Sy_v - theta * (Sx_v - n_v * xbar).
    """
    ev = load(spark, sf_dir, "events")
    span = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid")
    )
    variant = F.when(
        F.substring(
            F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))),
            1,
            1,
        ).isin(*"01234567"),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    us = F.unix_micros(F.col("ts"))
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id", "mid")
        .agg(
            F.coalesce(
                dsum(F.when(us <= F.col("mid"), F.col("value")), 2), F.lit(0.0)
            ).alias("x"),
            F.coalesce(
                dsum(F.when(us > F.col("mid"), F.col("value")), 2), F.lit(0.0)
            ).alias("y"),
        )
        .select("user_id", variant.alias("variant"), "x", "y")
    )

    def dm(expr, scale):
        return F.sum(expr.cast(f"decimal(38,{scale})")).cast("double")

    x, y = F.col("x"), F.col("y")
    vm = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dm(x, 2).alias("sx"),
        dm(y, 2).alias("sy"),
        dm(x * x, 4).alias("sxx"),
        dm(x * y, 4).alias("sxy"),
        dm(y * y, 4).alias("syy"),
    )
    pooled = vm.agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sy").alias("sy"),
        F.sum("sxx").alias("sxx"),
        F.sum("sxy").alias("sxy"),
        F.sum("syy").alias("syy"),
    )
    n = F.col("n")
    cxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    cxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    cyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    theta = pooled.select(
        (F.col("sx") / n).alias("xbar"),
        (cxy / cxx).alias("th"),
        ((cxy * cxy) / (cxx * cyy)).alias("r2"),
    )
    yc_sum = F.col("sy") - F.col("th") * (
        F.col("sx") - F.col("n") * F.col("xbar")
    )
    return (
        vm.crossJoin(F.broadcast(theta))
        .select(
            "variant",
            F.col("n").cast("bigint").alias("n_users"),
            dround(F.col("sy") / F.col("n"), 4).alias("mean_y"),
            dround(yc_sum / F.col("n"), 4).alias("mean_y_cuped"),
            dround(F.col("th"), 6).alias("theta"),
            dround(F.col("r2"), 6).alias("var_reduction"),
        )
        .orderBy("variant")
    )


# ---------------------------------------------------------------------------
# Episode mining: "A happens before B" co-occurrence with lift
# ---------------------------------------------------------------------------

EPISODE_SQL = """
WITH fo0 AS (
  SELECT user_id, event_type, MIN(ts) AS fts
  FROM events GROUP BY user_id, event_type
),
fo AS (
  SELECT f.user_id, f.event_type, f.fts, MIN(e.event_id) AS feid
  FROM fo0 f
  JOIN events e ON e.user_id = f.user_id
   AND e.event_type = f.event_type AND e.ts = f.fts
  GROUP BY f.user_id, f.event_type, f.fts
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         COUNT(*) AS n_ab
  FROM fo a JOIN fo b
    ON a.user_id = b.user_id
   AND (a.fts < b.fts OR (a.fts = b.fts AND a.feid < b.feid))
  GROUP BY a.event_type, b.event_type
),
marg AS (SELECT event_type, COUNT(*) AS n_t FROM fo GROUP BY event_type),
u AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events)
SELECT p.type_a, p.type_b, p.n_ab,
       FLOOR(CAST(p.n_ab AS DOUBLE) / ma.n_t * 1000000 + 0.5) / 1000000
         AS confidence,
       FLOOR(CAST(p.n_ab AS DOUBLE) * u.n_users
             / (CAST(ma.n_t AS DOUBLE) * mb.n_t) * 1000000 + 0.5) / 1000000
         AS lift
FROM pairs p
JOIN marg ma ON p.type_a = ma.event_type
JOIN marg mb ON p.type_b = mb.event_type
CROSS JOIN u
"""


@register(
    "events_episode_lift",
    oracle=EPISODE_SQL,
    survey=["episode-mining", "sequential-patterns", "user-journey"],
)
def events_episode_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Episode pairs over user journeys: for each ordered event-type pair
    (A, B), the number of users whose FIRST A precedes their FIRST B,
    with confidence P(B after A | A) and lift vs independence. Unlike
    event_transitions (consecutive Markov steps) this counts
    subsequence containment at any gap -- the sequential-pattern
    support an episode miner (WINEPI-style) computes.

    Determinism: first occurrences are min(struct(ts, event_id)) so
    same-timestamp ties break on the stable event id; ordering between
    two first-occurrences compares (ts, event_id) lexicographically.
    Confidence/lift are single IEEE divisions of exact counts, quantized
    at 1e-6.

    Scale shape: one map-combinable aggregate to first-occurrences
    (|users| x |types| rows -- types is a small enum, so this is
    user-cardinality), then a per-user self-join whose fan-out is
    |types|^2 per user (bounded, ~36), never |events|^2. Marginals are
    type-cardinality-sized and broadcast. The distinct-user count rides
    a separate tiny aggregate."""
    ev = load(spark, sf_dir, "events")
    fo = ev.groupBy("user_id", F.col("event_type")).agg(
        F.min(F.struct("ts", "event_id")).alias("f")
    ).select(
        "user_id",
        "event_type",
        F.col("f.ts").alias("fts"),
        F.col("f.event_id").alias("feid"),
    )
    a, b = fo.alias("a"), fo.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (
                (F.col("a.fts") < F.col("b.fts"))
                | (
                    (F.col("a.fts") == F.col("b.fts"))
                    & (F.col("a.feid") < F.col("b.feid"))
                )
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    marg = fo.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_t"))
    users = ev.agg(F.countDistinct("user_id").alias("n_users"))
    conf = F.col("n_ab").cast("double") / F.col("ma.n_t")
    lift = (
        F.col("n_ab").cast("double")
        * F.col("n_users")
        / (F.col("ma.n_t").cast("double") * F.col("mb.n_t"))
    )
    return (
        pairs.join(
            F.broadcast(marg.alias("ma")),
            F.col("type_a") == F.col("ma.event_type"),
        )
        .join(
            F.broadcast(marg.alias("mb")),
            F.col("type_b") == F.col("mb.event_type"),
        )
        .crossJoin(F.broadcast(users))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            dround(conf, 6).alias("confidence"),
            dround(lift, 6).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Markov next-event prediction, temporally split and evaluated
# ---------------------------------------------------------------------------

MARKOV_EVAL_SQL = """
WITH bounds AS (
  SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM events
),
cut AS (SELECT hi - (hi - lo) // 5 AS cut_us FROM bounds),
seq AS (
  SELECT user_id, event_type AS cur, ts,
         LEAD(event_type) OVER w AS nxt,
         LEAD(epoch_us(ts)) OVER w AS nxt_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
trans AS (
  SELECT cur, nxt, nxt_us FROM seq WHERE nxt IS NOT NULL
),
train AS (
  SELECT cur, nxt, COUNT(*) AS n
  FROM trans CROSS JOIN cut WHERE nxt_us <= cut_us
  GROUP BY cur, nxt
),
pred AS (
  SELECT cur, nxt AS predicted
  FROM (SELECT cur, nxt,
               ROW_NUMBER() OVER (PARTITION BY cur
                                  ORDER BY n DESC, nxt ASC) AS rk
        FROM train)
  WHERE rk = 1
),
test AS (
  SELECT cur, nxt FROM trans CROSS JOIN cut WHERE nxt_us > cut_us
)
SELECT t.cur,
       p.predicted,
       COUNT(*) AS n_test,
       CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       FLOOR(CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*) * 1000000 + 0.5) / 1000000
         AS accuracy
FROM test t JOIN pred p ON t.cur = p.cur
GROUP BY t.cur, p.predicted
"""


@register(
    "markov_next_event_eval",
    oracle=MARKOV_EVAL_SQL,
    survey=["markov", "temporal-split", "model-eval", "user-journey"],
)
def markov_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/evaluate the first-order Markov next-event predictor with a
    TEMPORAL split (the only honest split for sequence models --
    random splits leak future behavior into training): transitions
    whose successor lands in the first 80% of the time range train the
    argmax-next-type table; transitions after the cutoff are held out
    and scored. Output: per current-type prediction, test support, and
    accuracy -- the eval harness companion to event_transitions.

    Determinism: the cutoff is integer microsecond arithmetic on
    min/max event times (exact in both engines); the argmax breaks
    count ties on type name ascending; accuracy is one IEEE division
    of exact counts, quantized at 1e-6.

    Scale shape: one user-keyed lead window (the same exchange as
    event_transitions), then type-cardinality-sized aggregates; the
    bounds ride a tiny scalar aggregate broadcast into the stream --
    no second corpus pass, no data-dependent literal baked at plan
    time."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.unix_micros("ts")).alias("lo"),
        F.max(F.unix_micros("ts")).alias("hi"),
    ).select(
        (F.col("hi") - ((F.col("hi") - F.col("lo")) / 5).cast("long")).alias(
            "cut_us"
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("cur"),
            F.lead("event_type").over(w).alias("nxt"),
            F.lead(F.unix_micros("ts")).over(w).alias("nxt_us"),
        )
        .filter(F.col("nxt").isNotNull())
        .crossJoin(F.broadcast(bounds))
    )
    train = (
        trans.filter(F.col("nxt_us") <= F.col("cut_us"))
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rk = F.row_number().over(
        Window.partitionBy("cur").orderBy(F.col("n").desc(), F.col("nxt").asc())
    )
    pred = (
        train.select("cur", "nxt", rk.alias("rk"))
        .filter(F.col("rk") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    test = trans.filter(F.col("nxt_us") > F.col("cut_us")).select("cur", "nxt")
    correct = F.sum(
        F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
    )
    return (
        test.join(F.broadcast(pred), "cur")
        .groupBy("cur", "predicted")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            correct.alias("n_correct"),
        )
        .select(
            "cur",
            "predicted",
            "n_test",
            "n_correct",
            dround(
                F.col("n_correct").cast("double") / F.col("n_test"), 6
            ).alias("accuracy"),
        )
    )


# ---------------------------------------------------------------------------
# Difference-in-differences readout (causal companion to CUPED)
# ---------------------------------------------------------------------------

AB_DID_SQL = """
WITH span AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
per_user AS (
  SELECT user_id,
         CASE WHEN substr(md5(concat('ab|', CAST(user_id AS VARCHAR))), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 'A' ELSE 'B' END AS variant,
         COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) <= span.mid
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS x,
         COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) > span.mid
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS y
  FROM events, span
  GROUP BY user_id, span.mid
),
vm AS (
  SELECT variant, CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,2))) AS DOUBLE) AS sy
  FROM per_user GROUP BY variant
)
SELECT CAST(a.n AS BIGINT) AS n_control,
       CAST(b.n AS BIGINT) AS n_treated,
       FLOOR((a.sy / a.n - a.sx / a.n) * 10000 + 0.5) / 10000
         AS delta_control,
       FLOOR((b.sy / b.n - b.sx / b.n) * 10000 + 0.5) / 10000
         AS delta_treated,
       FLOOR(((b.sy / b.n - b.sx / b.n) - (a.sy / a.n - a.sx / a.n))
             * 10000 + 0.5) / 10000 AS did
FROM (SELECT * FROM vm WHERE variant = 'A') a,
     (SELECT * FROM vm WHERE variant = 'B') b
"""


@register(
    "ab_did_readout",
    oracle=AB_DID_SQL,
    survey=["diff-in-diffs", "causal-inference", "ab-testing"],
)
def ab_did_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: the treated variant's pre-to-post
    change minus the control's -- the causal-inference readout that
    strips out the common time trend a naive post-period comparison
    confounds (the companion to ab_cuped_adjusted, which reduces
    variance but not trend bias). Same md5 variant split and mid-span
    pre/post periods as CUPED, so the two readouts are directly
    comparable.

    Determinism: per-user period sums and per-variant sums are exact
    decimal; the readout is a fixed IEEE op sequence on six scalars,
    floored at 1e-4.

    Scale shape: the identical ONE-pass user-keyed aggregate as CUPED
    (two rows after the variant rollup); the final readout is a 1x1
    cross join of two scalar rows."""
    ev = load(spark, sf_dir, "events")
    span = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid")
    )
    variant = F.when(
        F.substring(
            F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))),
            1,
            1,
        ).isin(*"01234567"),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    us = F.unix_micros(F.col("ts"))
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id", "mid")
        .agg(
            F.coalesce(
                dsum(F.when(us <= F.col("mid"), F.col("value")), 2), F.lit(0.0)
            ).alias("x"),
            F.coalesce(
                dsum(F.when(us > F.col("mid"), F.col("value")), 2), F.lit(0.0)
            ).alias("y"),
        )
        .select(variant.alias("variant"), "x", "y")
    )
    vm = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(38,2)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,2)")).cast("double").alias("sy"),
    )
    a = vm.filter(F.col("variant") == "A").alias("a")
    b = vm.filter(F.col("variant") == "B").alias("b")
    da = F.col("a.sy") / F.col("a.n") - F.col("a.sx") / F.col("a.n")
    db = F.col("b.sy") / F.col("b.n") - F.col("b.sx") / F.col("b.n")
    q = F.lit(10000)
    return a.crossJoin(b).select(
        F.col("a.n").cast("bigint").alias("n_control"),
        F.col("b.n").cast("bigint").alias("n_treated"),
        (F.floor(da * q + 0.5) / q).alias("delta_control"),
        (F.floor(db * q + 0.5) / q).alias("delta_treated"),
        (F.floor((db - da) * q + 0.5) / q).alias("did"),
    )


# ---------------------------------------------------------------------------
# Uplift by score decile (targeting-policy readout)
# ---------------------------------------------------------------------------

UPLIFT_SQL = """
WITH span AS (
  SELECT (MIN(epoch_us(ts)) + MAX(epoch_us(ts))) // 2 AS mid FROM events
),
per_user AS (
  SELECT user_id,
         CASE WHEN substr(md5(concat('ab|', CAST(user_id AS VARCHAR))), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 'A' ELSE 'B' END AS variant,
         COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) <= span.mid
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS x,
         COALESCE(CAST(SUM(CASE WHEN epoch_us(ts) > span.mid
                    THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0)
           AS y
  FROM events, span
  GROUP BY user_id, span.mid
),
ranked AS (
  SELECT *,
         (ROW_NUMBER() OVER (ORDER BY x DESC, user_id) - 1) * 10
           // COUNT(*) OVER () + 1 AS decile
  FROM per_user
)
SELECT decile,
       CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_treated,
       CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_control,
       FLOOR(CAST(SUM(CASE WHEN variant = 'B'
                  THEN CAST(y AS DECIMAL(38,2)) END) AS DOUBLE)
             / SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
             * 10000 + 0.5) / 10000 AS y_treated,
       FLOOR(CAST(SUM(CASE WHEN variant = 'A'
                  THEN CAST(y AS DECIMAL(38,2)) END) AS DOUBLE)
             / SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)
             * 10000 + 0.5) / 10000 AS y_control,
       FLOOR((CAST(SUM(CASE WHEN variant = 'B'
                  THEN CAST(y AS DECIMAL(38,2)) END) AS DOUBLE)
              / SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)
              - CAST(SUM(CASE WHEN variant = 'A'
                    THEN CAST(y AS DECIMAL(38,2)) END) AS DOUBLE)
                / SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END))
             * 10000 + 0.5) / 10000 AS uplift
FROM ranked
GROUP BY decile
"""


@register(
    "events_uplift_by_decile",
    oracle=UPLIFT_SQL,
    survey=["uplift", "qini", "targeting", "ab-testing"],
)
def events_uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift (treated-minus-control post-period mean) per pre-period
    score decile -- the qini-curve table an uplift-modeling pipeline
    reads to decide WHO to target: a useful targeting score
    concentrates uplift in its top deciles; a useless one shows a flat
    profile. Score = the user's pre-period value (the same proxy
    ab_cuped_adjusted uses as its covariate), variants from the shared
    md5 split, so all three experiment readouts (CUPED, DiD, uplift)
    are directly comparable.

    Determinism: per-user period sums are exact decimal; deciles come
    from a ROW_NUMBER with full (x, user_id) tie-break and integer
    arithmetic; per-decile means are exact-decimal sums through one
    IEEE division, floored at 1e-4.

    Scale note: the decile rank is a global window over the USER
    aggregate (one row per user) -- the customer_rfm_segments
    precedent; at production user counts the documented swap is a
    two-pass histogram-offset rank (exact_percentiles_two_pass), same
    decile semantics."""
    ev = load(spark, sf_dir, "events")
    span = ev.agg(
        ((F.min(F.unix_micros("ts")) + F.max(F.unix_micros("ts"))) / 2)
        .cast("long")
        .alias("mid")
    )
    variant = F.when(
        F.substring(
            F.md5(F.concat(F.lit("ab|"), F.col("user_id").cast("string"))),
            1,
            1,
        ).isin(*"01234567"),
        F.lit("A"),
    ).otherwise(F.lit("B"))
    us = F.unix_micros(F.col("ts"))
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .groupBy("user_id", "mid")
        .agg(
            F.coalesce(
                dsum(F.when(us <= F.col("mid"), F.col("value")), 2), F.lit(0.0)
            ).alias("x"),
            F.coalesce(
                dsum(F.when(us > F.col("mid"), F.col("value")), 2), F.lit(0.0)
            ).alias("y"),
        )
        .select("user_id", variant.alias("variant"), "x", "y")
    )
    wr = Window.partitionBy().orderBy(F.col("x").desc(), "user_id")
    wn = Window.partitionBy()
    ranked = per_user.select(
        "variant",
        "y",
        (
            F.floor(
                (F.row_number().over(wr) - 1)
                * 10
                / F.count(F.lit(1)).over(wn)
            ).cast("long")
            + 1
        ).alias("decile"),
    )
    yd = F.col("y").cast("decimal(38,2)")
    st = F.sum(F.when(F.col("variant") == "B", yd))
    sc = F.sum(F.when(F.col("variant") == "A", yd))
    nt = F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
    nc = F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
    mt = st.cast("double") / nt
    mc = sc.cast("double") / nc
    q = F.lit(10000)
    return ranked.groupBy("decile").agg(
        nt.cast("bigint").alias("n_treated"),
        nc.cast("bigint").alias("n_control"),
        (F.floor(mt * q + 0.5) / q).alias("y_treated"),
        (F.floor(mc * q + 0.5) / q).alias("y_control"),
        (F.floor((mt - mc) * q + 0.5) / q).alias("uplift"),
    )


# ---------------------------------------------------------------------------
# SCD Type 2: per-user state history with validity intervals (round 10)
# ---------------------------------------------------------------------------

SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
runs AS (
  SELECT user_id, event_type, ts,
         SUM(CASE WHEN prev_type IS NULL OR prev_type != event_type
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seg
  FROM ordered
),
segs AS (
  SELECT user_id, event_type, seg,
         MIN(ts) AS valid_from,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM runs GROUP BY user_id, event_type, seg
)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg)
         AS valid_to,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg) IS NULL
         AS is_current,
       n_events
FROM segs
"""


@register(
    "scd2_user_state_history",
    oracle=SCD2_SQL,
    survey=["scd2", "slowly-changing-dimension", "warehouse", "intervals"],
)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build from a change log: each
    user's event stream is collapsed into maximal runs of constant
    event_type, emitted as validity intervals [valid_from, valid_to)
    with the open interval flagged ``is_current`` -- the standard
    warehouse history table (cdc_latest_state is the Type-1 twin that
    keeps only the last row; this keeps the full auditable history an
    as-of join can probe).

    Mechanics: the classic gaps-and-islands construction -- lag to
    detect changes, a running change-count as the island id, one
    aggregate per island, lead for the closing bound. Determinism:
    every window orders by the full (ts, event_id) key.

    Scale shape: ALL windows partition by user_id (key-partitioned,
    never global -- the sessionize/retention precedent); the island
    aggregate is map-combinable on (user, type, seg). One shuffle on
    user_id shared by every stage, no join anywhere."""
    ev = load(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(wo).alias("prev_type"),
    )
    runs = ordered.select(
        "user_id",
        "event_type",
        "ts",
        F.sum(
            F.when(
                F.col("prev_type").isNull()
                | (F.col("prev_type") != F.col("event_type")),
                1,
            ).otherwise(0)
        )
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("seg"),
    )
    segs = runs.groupBy("user_id", "event_type", "seg").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    ws = Window.partitionBy("user_id").orderBy("seg")
    return segs.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(ws).alias("valid_to"),
        F.lead("valid_from").over(ws).isNull().alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Sequential pattern mining: frequent 3-event sequences (round 10)
# ---------------------------------------------------------------------------

_SEQ_TOPK = 50

SEQ_MINING_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type AS t1,
         LEAD(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t2,
         LEAD(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS t3
  FROM events
),
triples AS (
  SELECT t1, t2, t3,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
  FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
  GROUP BY t1, t2, t3
),
nu AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS total_users
       FROM events)
SELECT t1, t2, t3, n_occurrences, n_users,
       FLOOR(CAST(n_users AS DOUBLE) / total_users * 1000000 + 0.5)
         / 1000000 AS support
FROM triples CROSS JOIN nu
ORDER BY n_users DESC, n_occurrences DESC, t1, t2, t3
LIMIT {_SEQ_TOPK}
"""


@register(
    "event_sequence_mining",
    oracle=SEQ_MINING_SQL,
    survey=["sequence-mining", "sequential-patterns", "behavioral"],
)
def event_sequence_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent consecutive 3-event sequences: every (t1 -> t2 -> t3)
    run in a user's time-ordered stream, ranked by USER support (the
    GSP/PrefixSpan level-3 readout) -- the sequential upgrade of
    event_transitions' bigram matrix: 'view -> cart -> purchase' vs
    'view -> cart -> view' separates converting paths from browsing
    loops, which no unordered co-occurrence query can see.

    Determinism: windows order by the full (ts, event_id) key; support
    is one exact-int divide quantized at 1e-6; the top-{topk} carries
    the full (n_users, n_occurrences, t1, t2, t3) tie-break.

    Scale shape: the two LEADs share ONE key-partitioned window pass
    (user-keyed, never global); triple counting is a map-combinable
    aggregate on the (t1,t2,t3) domain (|event types|^3 groups, ~200);
    distinct-user support shuffles on the same bounded triple key. The
    top-k is a TakeOrdered over the bounded triple domain."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    triples = seq.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
    )
    nu = ev.agg(
        F.count_distinct("user_id").cast("bigint").alias("total_users")
    )
    return (
        triples.crossJoin(F.broadcast(nu))
        .select(
            "t1",
            "t2",
            "t3",
            "n_occurrences",
            "n_users",
            dround(
                F.col("n_users").cast("double") / F.col("total_users"), 6
            ).alias("support"),
        )
        .orderBy(
            F.col("n_users").desc(),
            F.col("n_occurrences").desc(),
            "t1",
            "t2",
            "t3",
        )
        .limit(_SEQ_TOPK)
    )


event_sequence_mining.__doc__ = event_sequence_mining.__doc__.format(
    topk=_SEQ_TOPK
)


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (absorbing chain, round 10)
# ---------------------------------------------------------------------------

_MRK_Q = 10**9  # absorption probabilities in integer 1e-9 units
_MRK_ROUNDS = 40  # fixed value-iteration schedule (identical both engines)
_MRK_CHANNELS = ("click", "error", "signup", "view")
_MRK_CONV = "purchase"

_MRK_TRANS_SQL = f"""
ev AS (
  SELECT user_id, ts, event_id, event_type AS t,
         COALESCE(SUM(CASE WHEN event_type = '{_MRK_CONV}' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ep
  FROM events
),
seq AS (
  SELECT user_id, ep, t,
         ROW_NUMBER() OVER (PARTITION BY user_id, ep
                            ORDER BY ts, event_id) AS rn,
         LEAD(t) OVER (PARTITION BY user_id, ep
                       ORDER BY ts, event_id) AS nt
  FROM ev
),
trans AS (
  SELECT '__start__' AS s,
         CASE WHEN t = '{_MRK_CONV}' THEN '__conv__' ELSE t END AS s2
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT t,
         CASE WHEN nt IS NULL THEN '__null__'
              WHEN nt = '{_MRK_CONV}' THEN '__conv__' ELSE nt END
  FROM seq WHERE t != '{_MRK_CONV}'
),
cnt AS MATERIALIZED (
  SELECT s, s2, CAST(COUNT(*) AS BIGINT) AS n FROM trans GROUP BY s, s2
),
ns AS MATERIALIZED (SELECT s, CAST(SUM(n) AS BIGINT) AS tot FROM cnt GROUP BY s)
"""


def _mrk_pval(col_prev: str, removed: str | None) -> str:
    """The value a transition target contributes in one iteration:
    conv absorbs at Q, null (and the removed channel) at 0, transient
    states at the previous round's value."""
    rm = (
        f"WHEN c.s2 = '{removed}' THEN 0\n         "
        if removed is not None
        else ""
    )
    return (
        f"CASE WHEN c.s2 = '__conv__' THEN {_MRK_Q}\n         "
        f"WHEN c.s2 = '__null__' THEN 0\n         "
        f"{rm}ELSE COALESCE(p.{col_prev}, 0) END"
    )


def _mrk_sql() -> str:
    """Unrolled integer value iteration, one chain carrying the FULL
    chain and every single-channel-removed variant as parallel columns
    (kcore discipline: AS MATERIALIZED per stage, fixed round count)."""
    cols = ["v_full"] + [f"v_{c}" for c in _MRK_CHANNELS]
    removed = [None] + list(_MRK_CHANNELS)
    stages = [
        "p0 AS MATERIALIZED (SELECT s, "
        + ", ".join(f"CAST(0 AS BIGINT) AS {c}" for c in cols)
        + " FROM ns)"
    ]
    for r in range(1, _MRK_ROUNDS + 1):
        upd = ",\n    ".join(
            f"CAST(SUM((c.n * ({_mrk_pval(col, rm)})) // t.tot) AS BIGINT)"
            f" AS {col}"
            for col, rm in zip(cols, removed)
        )
        stages.append(
            f"""p{r} AS MATERIALIZED (
  SELECT c.s,
    {upd}
  FROM cnt c JOIN ns t ON c.s = t.s
  LEFT JOIN p{r - 1} p ON c.s2 = p.s
  GROUP BY c.s)"""
        )
    finals = ",\n  ".join(
        f"('{c}', (SELECT v_{c} FROM p{_MRK_ROUNDS} WHERE s = '__start__'))"
        for c in _MRK_CHANNELS
    )
    return (
        "WITH "
        + _MRK_TRANS_SQL
        + ",\n"
        + ",\n".join(stages)
        + f""",
base AS (SELECT v_full FROM p{_MRK_ROUNDS} WHERE s = '__start__'),
rem(channel, v) AS (VALUES
  {finals})
SELECT channel,
       FLOOR(CAST(base.v_full AS DOUBLE) / {_MRK_Q} * 1000000000 + 0.5)
         / 1000000000 AS p_conversion,
       FLOOR(CAST(rem.v AS DOUBLE) / {_MRK_Q} * 1000000000 + 0.5)
         / 1000000000 AS p_without,
       CASE WHEN base.v_full = 0 THEN NULL
            ELSE FLOOR((1.0 - CAST(rem.v AS DOUBLE) / base.v_full)
                       * 1000000 + 0.5) / 1000000 END AS removal_effect
FROM rem CROSS JOIN base
"""
    )


@register(
    "markov_removal_effect",
    oracle=_mrk_sql(),
    survey=["attribution", "markov-chain", "removal-effect", "behavioral"],
)
def markov_removal_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven multi-touch attribution by Markov removal effects
    (Anderl et al.): model user episodes as an absorbing chain
    (start -> events -> conversion | drop-off), then for each channel
    measure how much conversion probability is lost when every
    transition INTO that channel is redirected to the drop-off
    absorber -- the standard upgrade over last-touch
    (events_attribution) that credits assisting channels.

    Engine-exactness: absorption probabilities are value-iterated in
    PURE INTEGER 1e-9 units with per-term floor division ((n * v) DIV
    tot, positive operands) over a FIXED {rounds}-round schedule, so
    the full chain and all {nch} removal variants are bit-identical on
    both engines (no float sum ordering anywhere). The oracle runs the
    same schedule as unrolled MATERIALIZED stages with the removal
    variants as parallel columns.

    Scale shape: the corpus-sized work is ONE pass -- episode-keyed
    windows (user-partitioned) and a map-combinable transition count
    onto the (states+2)^2 bounded domain; the chain solve is driver
    arithmetic over <= ~30 integer matrix entries (model_channel-
    bounded: the fellegi_sunter_em precedent)."""
    ev = load(spark, sf_dir, "events")
    wp = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("t"),
        F.coalesce(
            F.sum(
                F.when(F.col("event_type") == _MRK_CONV, 1).otherwise(0)
            ).over(wp.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("ep"),
    )
    we = Window.partitionBy("user_id", "ep").orderBy("ts", "event_id")
    seq = e.select(
        "t",
        F.row_number().over(we).alias("rn"),
        F.lead("t").over(we).alias("nt"),
    )
    conv_case = F.when(F.col("t") == _MRK_CONV, "__conv__").otherwise(
        F.col("t")
    )
    starts = seq.filter(F.col("rn") == 1).select(
        F.lit("__start__").alias("s"), conv_case.alias("s2")
    )
    steps = seq.filter(F.col("t") != _MRK_CONV).select(
        F.col("t").alias("s"),
        F.when(F.col("nt").isNull(), "__null__")
        .when(F.col("nt") == _MRK_CONV, "__conv__")
        .otherwise(F.col("nt"))
        .alias("s2"),
    )
    cnt = (
        starts.unionAll(steps)
        .groupBy("s", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    n_states = len(_MRK_CHANNELS) + 1  # transient states incl. __start__
    rows = model_channel(
        cnt,
        (n_states + 1) * (n_states + 2),
        "transition counts: (states+1) x (states+2) bounded domain",
    )
    trans: dict[str, list[tuple[str, int]]] = {}
    tot: dict[str, int] = {}
    for r in rows:
        trans.setdefault(r["s"], []).append((r["s2"], int(r["n"])))
        tot[r["s"]] = tot.get(r["s"], 0) + int(r["n"])

    def _solve(removed: str | None) -> int:
        p = {s: 0 for s in tot}
        for _ in range(_MRK_ROUNDS):
            nxt = {}
            for s, outs in trans.items():
                acc = 0
                for s2, n in outs:
                    if s2 == "__conv__":
                        v = _MRK_Q
                    elif s2 == "__null__" or s2 == removed:
                        v = 0
                    else:
                        v = p.get(s2, 0)
                    acc += (n * v) // tot[s]
                nxt[s] = acc
            p = nxt
        return p.get("__start__", 0)

    import math

    base = _solve(None)
    out = []
    for c in _MRK_CHANNELS:
        v = _solve(c)
        eff = (
            None
            if base == 0
            else math.floor((1.0 - v / base) * 1000000 + 0.5) / 1000000
        )
        out.append(
            (
                c,
                math.floor(base / _MRK_Q * 1000000000 + 0.5) / 1000000000,
                math.floor(v / _MRK_Q * 1000000000 + 0.5) / 1000000000,
                eff,
            )
        )
    return spark.createDataFrame(
        out,
        "channel STRING, p_conversion DOUBLE, p_without DOUBLE, "
        "removal_effect DOUBLE",
    )


markov_removal_effect.__doc__ = markov_removal_effect.__doc__.format(
    rounds=_MRK_ROUNDS, nch=len(_MRK_CHANNELS)
)


# ---------------------------------------------------------------------------
# Stratified-matching ATT readout (round 10)
# ---------------------------------------------------------------------------

ATT_SQL = """
WITH fe AS (
  SELECT user_id,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS treated
  FROM (SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events)
  WHERE rn = 1
),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(FLOOR(value * 1000 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y_milli
  FROM events GROUP BY user_id
),
u AS (
  SELECT a.user_id, a.n_events, f.treated, a.y_milli
  FROM agg a JOIN fe f ON a.user_id = f.user_id
),
b AS (
  SELECT CAST(FLOOR(LOG2(CAST(n_events AS DOUBLE))) AS BIGINT) AS bucket,
         treated, y_milli
  FROM u
),
g AS (
  SELECT bucket,
         CAST(SUM(treated) AS BIGINT) AS n_t,
         CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_c,
         CAST(SUM(CASE WHEN treated = 1 THEN y_milli ELSE 0 END)
              AS BIGINT) AS y_t,
         CAST(SUM(CASE WHEN treated = 0 THEN y_milli ELSE 0 END)
              AS BIGINT) AS y_c
  FROM b GROUP BY bucket
),
d AS (
  SELECT bucket, n_t, n_c,
         FLOOR(CAST(y_t AS DOUBLE) / n_t / 1000 * 1000000 + 0.5)
           / 1000000 AS mean_t,
         FLOOR(CAST(y_c AS DOUBLE) / n_c / 1000 * 1000000 + 0.5)
           / 1000000 AS mean_c,
         CAST(FLOOR((CAST(y_t AS DOUBLE) / n_t
                     - CAST(y_c AS DOUBLE) / n_c) / 1000 * n_t
                    * 1000000 + 0.5) AS BIGINT) AS contrib_q
  FROM g WHERE n_t > 0 AND n_c > 0
),
tot AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS nt_total,
         CAST(SUM(contrib_q) AS BIGINT) AS att_q
  FROM d
)
SELECT d.bucket, d.n_t, d.n_c, d.mean_t, d.mean_c,
       FLOOR((d.mean_t - d.mean_c) * 1000000 + 0.5) / 1000000 AS diff,
       FLOOR(CAST(tot.att_q AS DOUBLE) / tot.nt_total + 0.5)
         / 1000000 AS att
FROM d CROSS JOIN tot
"""


@register(
    "events_stratified_att",
    oracle=ATT_SQL,
    survey=["matching", "att", "causal-readout", "stratification"],
)
def events_stratified_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-matching treatment-effect readout: users who ever
    signed up (treated) vs those who never did, matched on activity
    level (log2 event-count buckets -- a row-local propensity proxy,
    no global NTILE window), with the ATT as the treated-weighted
    average of within-bucket outcome differences over buckets where
    BOTH groups exist -- the standard observational companion to the
    randomized CUPED/DiD readouts: it answers the same question when
    assignment wasn't randomized, by comparing like-for-like activity
    strata.

    Engine-exactness: outcomes are exact milli-cents integers; each
    bucket's contribution is a fixed IEEE op sequence quantized to
    integer 1e-6 units BEFORE the cross-bucket sum; LOG2 hits exact
    powers of two exactly in both engines, so bucket edges agree.

    Scale shape: one map-combinable per-user rollup, one aggregate
    onto the ~log2(max activity) bucket domain (~10 groups), and a
    broadcast totals row -- no window, no join on data-sized keys."""
    ev = load(spark, sf_dir, "events")
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fe = (
        ev.select(
            "user_id",
            "event_type",
            F.row_number().over(wf).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.when(F.col("event_type") == "signup", 1)
            .otherwise(0)
            .alias("treated"),
        )
    )
    agg = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 1000 + F.lit(0.5)).cast("bigint"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("y_milli"),
    )
    u = agg.join(fe, "user_id")
    b = u.select(
        F.floor(F.log2(F.col("n_events").cast("double")))
        .cast("bigint")
        .alias("bucket"),
        "treated",
        "y_milli",
    )
    g = b.groupBy("bucket").agg(
        F.sum("treated").cast("bigint").alias("n_t"),
        (F.count(F.lit(1)) - F.sum("treated")).cast("bigint").alias("n_c"),
        F.sum(F.when(F.col("treated") == 1, F.col("y_milli")).otherwise(0))
        .cast("bigint")
        .alias("y_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y_milli")).otherwise(0))
        .cast("bigint")
        .alias("y_c"),
    )
    mt = F.col("y_t").cast("double") / F.col("n_t")
    mc = F.col("y_c").cast("double") / F.col("n_c")
    d = g.filter((F.col("n_t") > 0) & (F.col("n_c") > 0)).select(
        "bucket",
        "n_t",
        "n_c",
        (F.floor(mt / 1000 * 1000000 + F.lit(0.5)) / 1000000).alias(
            "mean_t"
        ),
        (F.floor(mc / 1000 * 1000000 + F.lit(0.5)) / 1000000).alias(
            "mean_c"
        ),
        F.floor((mt - mc) / 1000 * F.col("n_t") * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("contrib_q"),
    )
    tot = d.agg(
        F.sum("n_t").cast("bigint").alias("nt_total"),
        F.sum("contrib_q").cast("bigint").alias("att_q"),
    )
    return d.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_t",
        "n_c",
        "mean_t",
        "mean_c",
        (
            F.floor((F.col("mean_t") - F.col("mean_c")) * 1000000 + F.lit(0.5))
            / 1000000
        ).alias("diff"),
        (
            F.floor(F.col("att_q").cast("double") / F.col("nt_total") + F.lit(0.5))
            / 1000000
        ).alias("att"),
    )


# ---------------------------------------------------------------------------
# Bot / automation screen: inter-event timing regularity (round 10)
# ---------------------------------------------------------------------------

_BOT_MIN_GAPS = 20
_BOT_CV_FLAG = 0.5  # humans are bursty (CV >~ 1); schedulers are regular

BOT_SCREEN_SQL = f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(LAG(ts) OVER
           (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events)
),
s AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap) AS BIGINT) AS s1,
         SUM(CAST(gap AS HUGEINT) * gap) AS s2
  FROM g WHERE gap IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(*) >= {_BOT_MIN_GAPS}
),
m AS (
  SELECT user_id, n_gaps,
         CAST(s1 AS DOUBLE) / n_gaps AS mean_us,
         CAST(s2 AS DOUBLE) / n_gaps
           - (CAST(s1 AS DOUBLE) / n_gaps)
             * (CAST(s1 AS DOUBLE) / n_gaps) AS var_us
  FROM s
)
SELECT user_id, n_gaps,
       FLOOR(mean_us / 1000000 * 10000 + 0.5) / 10000 AS mean_gap_sec,
       CASE WHEN mean_us > 0
            THEN FLOOR(SQRT(GREATEST(var_us, 0.0)) / mean_us
                       * 1000000 + 0.5) / 1000000 END AS cv,
       CASE WHEN mean_us > 0
            THEN SQRT(GREATEST(var_us, 0.0)) / mean_us < {_BOT_CV_FLAG}
            END AS is_bot_like
FROM m
"""


@register(
    "events_bot_screen",
    oracle=BOT_SCREEN_SQL,
    survey=["bot-detection", "timing-regularity", "data-quality"],
)
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automation screen on inter-event timing: per user, the
    coefficient of variation of gaps between consecutive events --
    human activity is bursty (CV near or above 1), schedulers and
    scripts are metronomic (CV near 0) -- flagging users with
    >= {min_gaps} gaps and CV < {flag}. The behavioral-data twin of the
    corpus quality gates: training on event streams means screening
    out machine traffic first.

    Engine-exactness: gaps are exact microsecond integers; the
    sum-of-squares promotes to DECIMAL(38)/HUGEINT on the respective
    engines (gap^2 at day scale overflows int64 -- the zscore-stream
    lesson, solved by widening instead of guarding since batch
    aggregates support it), and both engines cast the same exact
    integer to double before the identical mean/var/sqrt op sequence.

    Scale shape: one key-partitioned lag window, one map-combinable
    aggregate; no joins."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    s = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.sum("gap").cast("bigint").alias("s1"),
            F.sum(
                F.col("gap").cast("decimal(38,0)") * F.col("gap")
            ).alias("s2"),
        )
        .filter(F.col("n_gaps") >= _BOT_MIN_GAPS)
    )
    mean_us = F.col("s1").cast("double") / F.col("n_gaps")
    var_us = (
        F.col("s2").cast("double") / F.col("n_gaps") - mean_us * mean_us
    )
    cv = F.sqrt(F.greatest(var_us, F.lit(0.0))) / mean_us
    return s.select(
        "user_id",
        "n_gaps",
        (F.floor(mean_us / 1000000 * 10000 + F.lit(0.5)) / 10000).alias(
            "mean_gap_sec"
        ),
        F.when(
            mean_us > 0,
            F.floor(cv * 1000000 + F.lit(0.5)) / 1000000,
        ).alias("cv"),
        F.when(mean_us > 0, cv < _BOT_CV_FLAG).alias("is_bot_like"),
    )


events_bot_screen.__doc__ = events_bot_screen.__doc__.format(
    min_gaps=_BOT_MIN_GAPS, flag=_BOT_CV_FLAG
)


# ---------------------------------------------------------------------------
# Exponentially-decayed frequency (trending score, round 10)
# ---------------------------------------------------------------------------

_DECAY = 0.9  # per-day retention
_DECAY_Q = 10**12  # per-age weight quantization

DECAYED_FREQ_SQL = f"""
WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events),
a AS (
  SELECT event_type,
         DATE_DIFF('day', CAST(ts AS DATE), d0) AS age,
         COUNT(*) AS n
  FROM events CROSS JOIN mx
  GROUP BY event_type, age
),
w AS (
  SELECT event_type, age, n,
         CAST(FLOOR(EXP(age * LN({_DECAY})) * {_DECAY_Q} + 0.5)
              AS BIGINT) AS w_q
  FROM a
),
s AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS n_total,
         CAST(SUM(n * w_q) AS BIGINT) AS score_q
  FROM w GROUP BY event_type
)
SELECT event_type, n_total,
       FLOOR(CAST(score_q AS DOUBLE) / {_DECAY_Q} * 10000 + 0.5) / 10000
         AS decayed_score,
       FLOOR(CAST(score_q AS DOUBLE) / {_DECAY_Q} / n_total
             * 1000000 + 0.5) / 1000000 AS freshness
FROM s
"""


@register(
    "events_decayed_frequency",
    oracle=DECAYED_FREQ_SQL,
    survey=["decayed-frequency", "trending", "time-weighting"],
)
def events_decayed_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed frequency per event type (retention
    {decay}/day, anchored at the corpus max date): the trending score a
    feed/monitoring system ranks by -- raw counts answer 'what is
    common', decayed counts answer 'what is common NOW'; ``freshness``
    (decayed/raw) separates a recently-active type from a historically
    heavy one at the same volume.

    Engine-exactness: rows aggregate onto the BOUNDED (type x age-days)
    domain first, so the only transcendental (exp(age*ln {decay})) is
    evaluated once per age cell and quantized to integer 1e-12 units --
    the decayed sum is then exact integer arithmetic, never an
    order-dependent float fold over events.

    Scale shape: one map-combinable (type, age) count; the weighting
    and final rollup run on the calendar-bounded domain; the max-date
    anchor broadcasts."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.col("ts").cast("date")).alias("d0"))
    a = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy(
            "event_type",
            F.datediff(F.col("d0"), F.col("ts").cast("date")).alias("age"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = a.withColumn(
        "w_q",
        F.floor(
            F.exp(F.col("age") * F.log(F.lit(_DECAY))) * _DECAY_Q
            + F.lit(0.5)
        ).cast("bigint"),
    )
    s = w.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(F.col("n") * F.col("w_q")).cast("bigint").alias("score_q"),
    )
    return s.select(
        "event_type",
        "n_total",
        (
            F.floor(
                F.col("score_q").cast("double") / _DECAY_Q * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("decayed_score"),
        (
            F.floor(
                F.col("score_q").cast("double")
                / _DECAY_Q
                / F.col("n_total")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("freshness"),
    )


events_decayed_frequency.__doc__ = events_decayed_frequency.__doc__.format(
    decay=_DECAY
)


# ---------------------------------------------------------------------------
# Event-time disorder profile (watermark sizing, round 10)
# ---------------------------------------------------------------------------

_JITTER_MAX_US = 60_000_000  # simulated transport delay: 0..60 s

DISORDER_SQL = f"""
WITH arr AS (
  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
         epoch_us(CAST(ts AS TIMESTAMP))
           + CAST(concat('0x', substr(md5('jit|' ||
               CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
             % {_JITTER_MAX_US} AS arrival_us
  FROM events
),
l AS (
  SELECT user_id,
         MAX(ts_us) OVER (PARTITION BY user_id
           ORDER BY arrival_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - ts_us AS late_us
  FROM arr
),
b AS (
  SELECT CASE WHEN late_us = 0 THEN -1
              ELSE CAST(FLOOR(LOG2(CAST(late_us AS DOUBLE))) AS BIGINT)
         END AS bucket,
         COUNT(*) AS n
  FROM l GROUP BY 1
),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM b)
SELECT bucket, CAST(n AS BIGINT) AS n,
       FLOOR(CAST(n AS DOUBLE) / total * 1000000 + 0.5) / 1000000
         AS share,
       FLOOR(CAST(SUM(n) OVER (ORDER BY bucket) AS DOUBLE) / total
             * 1000000 + 0.5) / 1000000 AS cum_share
FROM b CROSS JOIN t
"""


@register(
    "events_disorder_profile",
    oracle=DISORDER_SQL,
    survey=["watermark-sizing", "disorder", "streaming-design"],
)
def events_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time disorder histogram: per event, how far its timestamp
    lags the per-user running maximum in ARRIVAL order, in
    log2-microsecond buckets with cumulative share -- the table that
    answers 'what watermark delay keeps X% of late data' BEFORE
    deploying a streaming job (bucket -1 = perfectly in-order; the
    smallest bucket whose cum_share clears the SLA is the delay to
    configure). Sizes per-key watermarks, matching how the sessionize/
    dedup jobs key their state. The fixture's event_ids arrive
    time-ordered, so arrival order is simulated with a deterministic
    md5 transport jitter of 0..60 s per event -- the documented model,
    identical on both engines.

    Engine-exactness: lateness is exact integer microseconds; LOG2
    hits powers of two exactly in both engines (log2-bucket
    precedent); shares are one divide each, and the cumulative runs
    over the ~45-bucket bounded spine.

    Scale shape: one key-partitioned running-max window (arrival
    order), one map-combinable bucket aggregate; the cumulative window
    sits on the bounded bucket-domain aggregate (sanctioned)."""
    ev = load(spark, sf_dir, "events")
    jitter = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("jit|"), F.col("event_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _JITTER_MAX_US
    )
    arr = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        (F.unix_micros("ts") + jitter).alias("arrival_us"),
    )
    w = Window.partitionBy("user_id").orderBy(
        "arrival_us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, 0)
    l = arr.select(
        (F.max("ts_us").over(w) - F.col("ts_us")).alias("late_us")
    )
    b = l.groupBy(
        F.when(F.col("late_us") == 0, F.lit(-1))
        .otherwise(
            F.floor(F.log2(F.col("late_us").cast("double"))).cast("bigint")
        )
        .alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))
    t = b.agg(F.sum("n").cast("bigint").alias("total"))
    wc = Window.partitionBy().orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return b.crossJoin(F.broadcast(t)).select(
        "bucket",
        F.col("n").cast("bigint").alias("n"),
        dround(F.col("n").cast("double") / F.col("total"), 6).alias(
            "share"
        ),
        dround(
            F.sum("n").over(wc).cast("double") / F.col("total"), 6
        ).alias("cum_share"),
    )


# ---------------------------------------------------------------------------
# Funnel step latency (round 10)
# ---------------------------------------------------------------------------

FUNNEL_LATENCY_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS first_click, MIN(v.first_view)
           AS first_view
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.first_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase, MIN(c.first_click)
           AS first_click
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.first_click
  GROUP BY e.user_id
),
durs AS (
  SELECT 'view_to_click' AS step, user_id,
         epoch_us(first_click) - epoch_us(first_view) AS dur_us
  FROM c
  UNION ALL
  SELECT 'click_to_purchase' AS step, user_id,
         epoch_us(first_purchase) - epoch_us(first_click) AS dur_us
  FROM p
),
r AS (
  SELECT step, dur_us,
         ROW_NUMBER() OVER (PARTITION BY step
                            ORDER BY dur_us, user_id) AS rn,
         COUNT(*) OVER (PARTITION BY step) AS n
  FROM durs
)
SELECT step, CAST(MAX(n) AS BIGINT) AS n_users,
       FLOOR(0.5 * CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END)
                        + MAX(CASE WHEN rn = n // 2 + 1 THEN dur_us END)
                        AS DOUBLE)
             / 1000000 * 1000 + 0.5) / 1000 AS median_sec,
       FLOOR(MAX(CASE WHEN rn = CAST(FLOOR(0.9 * (n - 1)) AS BIGINT) + 1
                      THEN dur_us END)
             / 1000000.0 * 1000 + 0.5) / 1000 AS p90_sec
FROM r GROUP BY step
"""


@register(
    "events_funnel_latency",
    oracle=FUNNEL_LATENCY_SQL,
    survey=["funnel-latency", "duration-quantiles", "rank-pick"],
)
def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel step: for the strictly-ordered
    view -> click -> purchase funnel (events_funnel's frontiers), the
    median and p90 of the duration each converting user spent between
    steps -- conversion COUNTS say where users drop, these say where
    they STALL.

    Determinism: durations are exact integer microseconds; the median
    is the explicit two-middle-rank average and the p90 a single
    rank-pick at floor(0.9*(n-1))+1 (never engine percentile
    interpolation -- the theilsen discipline).

    Scale shape: the funnel frontiers reuse events_funnel's
    one-exchange user-keyed chain; the quantile windows partition by
    STEP over one row per converted user (user-cardinality --
    customer_rfm precedent, sanctioned; at extreme user counts the
    swap is the two-pass fixed-precision histogram of
    exact_percentiles_two_pass)."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_click"),
            F.min("first_view").alias("first_view"),
        )
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click"))
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_purchase"),
            F.min("first_click").alias("first_click"),
        )
    )
    durs = c.select(
        F.lit("view_to_click").alias("step"),
        "user_id",
        (
            F.unix_micros("first_click") - F.unix_micros("first_view")
        ).alias("dur_us"),
    ).unionAll(
        p.select(
            F.lit("click_to_purchase").alias("step"),
            "user_id",
            (
                F.unix_micros("first_purchase")
                - F.unix_micros("first_click")
            ).alias("dur_us"),
        )
    )
    wr = Window.partitionBy("step").orderBy("dur_us", "user_id")
    wn = Window.partitionBy("step")
    r = durs.select(
        "step",
        "dur_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = 0.5 * (
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") + 1) / 2),
                F.col("dur_us"),
            )
        )
        + F.max(
            F.when(
                F.col("rn") == F.floor(F.col("n") / 2) + 1, F.col("dur_us")
            )
        )
    )
    p90 = F.max(
        F.when(
            F.col("rn")
            == F.floor(0.9 * (F.col("n") - 1)).cast("bigint") + 1,
            F.col("dur_us"),
        )
    )
    return r.groupBy("step").agg(
        F.max("n").cast("bigint").alias("n_users"),
        (F.floor(med / 1000000 * 1000 + F.lit(0.5)) / 1000).alias(
            "median_sec"
        ),
        (F.floor(p90 / 1000000.0 * 1000 + F.lit(0.5)) / 1000).alias(
            "p90_sec"
        ),
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness (round 10)
# ---------------------------------------------------------------------------

STICKINESS_SQL = """
WITH d AS (
  SELECT DATE_TRUNC('month', CAST(ts AS DATE)) AS month,
         CAST(ts AS DATE) AS day,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT DATE_TRUNC('month', CAST(ts AS DATE)) AS month,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM events GROUP BY 1
),
a AS (
  SELECT month, CAST(SUM(dau) AS BIGINT) AS dau_sum,
         CAST(COUNT(*) AS BIGINT) AS n_days
  FROM d GROUP BY month
)
SELECT CAST(a.month AS DATE) AS month, a.n_days, a.dau_sum, m.mau,
       FLOOR(CAST(a.dau_sum AS DOUBLE) / a.n_days / m.mau
             * 1000000 + 0.5) / 1000000 AS stickiness
FROM a JOIN m ON a.month = m.month
"""


@register(
    "events_dau_mau_stickiness",
    oracle=STICKINESS_SQL,
    survey=["stickiness", "dau-mau", "engagement", "G3"],
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per month (mean daily actives over monthly
    actives) -- the canonical engagement ratio: 1.0 means every monthly
    user shows up every day, ~0.03 means once-a-month usage.

    Scale shape: two count-distinct aggregates (day- and month-keyed
    -- the heavy work, both map-combinable shuffles on bounded
    calendar keys x user) and a calendar-bounded join; stickiness is
    exact-integer division quantized at 1e-6."""
    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    month = F.date_trunc("month", day).cast("date")
    d = ev.groupBy(month.alias("month"), day.alias("day")).agg(
        F.count_distinct("user_id").cast("bigint").alias("dau")
    )
    m = ev.groupBy(month.alias("month")).agg(
        F.count_distinct("user_id").cast("bigint").alias("mau")
    )
    a = d.groupBy("month").agg(
        F.sum("dau").cast("bigint").alias("dau_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    return a.join(m, "month").select(
        "month",
        "n_days",
        "dau_sum",
        "mau",
        dround(
            F.col("dau_sum").cast("double")
            / F.col("n_days")
            / F.col("mau"),
            6,
        ).alias("stickiness"),
    )
