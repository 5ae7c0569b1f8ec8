"""Error-bound tests for the approximate (sketch) twins of exact queries.

Sketch outputs are engine-specific, so the driver gives them a rows-only
check; these tests supply the missing correctness evidence by bounding
each estimate against the exact answer computed on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans import queries  # noqa: F401  (registry)
from flights_etl_pipeline_spark.plans.registry import REGISTRY, load

SF = "/root/testdata/sf0.01"


def test_hll_estimate_within_bounds(spark):
    """DataSketches HLL (lgK=12 default): relative standard error is
    ~1.04/sqrt(2^12) ~ 1.6%; assert within 5 sigma."""
    from flights_etl_pipeline_spark.plans.queries_events import (
        _hll_daily_estimates,
    )

    approx = {
        r["event_type"]: r["approx_users"]
        for r in _hll_daily_estimates(spark, SF).collect()
    }
    exact = {
        r["event_type"]: r["n_users"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, est in approx.items():
        assert abs(est - exact[et]) <= max(3.0, 0.08 * exact[et]), (
            et,
            est,
            exact[et],
        )


def test_approx_percentile_within_bounds(spark):
    """approx_percentile at accuracy 10000 guarantees rank error
    <= n/10000; with n ~ 3000 per priority group the estimate must land
    within a small rank neighborhood of the exact quantile. Assert the
    estimated p50/p90 are between the exact quantiles at +-2% rank."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        _price_percentile_estimates,
    )

    rows = _price_percentile_estimates(spark, SF).collect()
    ord_ = load(spark, SF, "orders")
    for r in rows:
        grp = ord_.filter(F.col("o_orderpriority") == r["o_orderpriority"])
        for p, est in (("0.5", r["p50"]), ("0.9", r["p90"]), ("0.99", r["p99"])):
            lo, hi = (
                grp.agg(
                    F.expr(
                        f"percentile(o_totalprice, {float(p) - 0.02})"
                    ).alias("lo"),
                    F.expr(
                        f"percentile(o_totalprice, {min(float(p) + 0.02, 1.0)})"
                    ).alias("hi"),
                )
                .collect()[0]
            )
            assert lo <= est <= hi, (r["o_orderpriority"], p, est, lo, hi)


def test_session_window_matches_islands_when_no_ties(spark):
    """With no exact-30:00 gaps in the data (verified in the fixture),
    native session_window and the gaps-and-islands formulation must
    produce identical session partitions."""
    native = (
        REGISTRY["events_session_window"]
        .fn(spark, SF)
        .select("user_id", "session_start", "n_events")
    )
    islands = (
        REGISTRY["events_sessionize"]
        .fn(spark, SF)
        .select(
            "user_id",
            F.col("session_start"),
            "n_events",
        )
    )
    assert native.count() == islands.count()
    assert native.exceptAll(islands).isEmpty()
