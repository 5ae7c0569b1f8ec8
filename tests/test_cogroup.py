"""Cogrouped-map surface: ``groupBy().cogroup().applyInPandas`` -- the
two-table grouped Python API (SURVEY section 2.8's UDF surface extended
to the cogroup form). Value-pinned against the pure-builtin join
formulation; kept as a test rather than a registered query because the
semantics ARE expressible with builtins, and the hot-path discipline
(no Python where the JVM can do it) is a plan-test invariant.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_cogroup_matches_builtin_join(spark):
    from flights_etl_pipeline_spark.plans.registry import load

    # defined inside the test so cloudpickle serializes it BY VALUE --
    # a module-level function would pickle by reference to the tests
    # module, which Spark workers cannot import
    def _merge_stats(key, views: pd.DataFrame, purchases: pd.DataFrame) -> pd.DataFrame:
        v_micro = (
            (views["value"] * 1_000_000 + 0.5).astype("int64").sum()
            if len(views)
            else 0
        )
        p_micro = (
            (purchases["value"] * 1_000_000 + 0.5).astype("int64").sum()
            if len(purchases)
            else 0
        )
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_views": [len(views)],
                "n_purchases": [len(purchases)],
                "micro_gap": [v_micro - p_micro],
            }
        )

    ev = load(spark, SF_DIR, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value"
    )
    got = (
        views.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            _merge_stats,
            "user_id LONG, n_views LONG, n_purchases LONG, micro_gap LONG",
        )
        .collect()
    )
    micro = F.floor(F.col("value") * 1_000_000 + F.lit(0.5)).cast("bigint")
    va = views.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_views"), F.sum(micro).alias("vm")
    )
    pa = purchases.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"), F.sum(micro).alias("pm")
    )
    expected = (
        va.join(pa, "user_id", "full_outer")
        .select(
            "user_id",
            F.coalesce("n_views", F.lit(0)).alias("n_views"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
            (
                F.coalesce("vm", F.lit(0)) - F.coalesce("pm", F.lit(0))
            ).alias("micro_gap"),
        )
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
