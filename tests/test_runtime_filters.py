"""Runtime bloom-filter join pruning (Spark 3.3+ runtime filters).

At 100 TB the probe side of a selective join should not fully scan:
Spark can inject a bloom filter built from the (small, filtered)
creation side into the probe side's scan stage. The feature gates on
size thresholds tuned for clusters, so the test lowers them to
demonstrate the mechanism at test scale — the *plan shape* (a
bloom_filter_might_contain predicate ahead of the join) is what must
hold at any scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_plans import SF_DIR, plan_str


@pytest.fixture
def bloom_session(spark):
    conf = spark.conf
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        ),
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "10MB",
        ),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "10GB",
        ),
        "spark.sql.autoBroadcastJoinThreshold": conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10MB"
        ),
    }
    conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB"
    )
    conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "1KB",
    )
    # force a shuffle join: a broadcast join already prunes via the
    # broadcast, so Spark (correctly) skips the bloom filter there
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in saved.items():
        conf.set(k, v)


def test_bloom_filter_injected_on_selective_shuffle_join(bloom_session):
    spark = bloom_session
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_totalprice") > 400000.0  # selective creation side
    )
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    plan = plan_str(joined, mode="extended")
    # the probe side gains might_contain(<bloom built from o_orderkey>)
    assert "might_contain" in plan
    assert "bloom_filter_agg" in plan


def test_bloom_filter_result_unchanged(bloom_session):
    spark = bloom_session
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_totalprice") > 400000.0
    )
    with_bloom = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    without = li.join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).count()
    assert with_bloom == without


# ---------------------------------------------------------------------------
# Explicit bloom semi-join reduction (the registered, audited variant)
# ---------------------------------------------------------------------------


def test_explicit_bloom_no_false_negatives(spark):
    """The bloom pre-filter must never drop a true match: the bloomed
    join's count and revenue equal the direct join's, and the audit
    columns are internally consistent."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        _BF_SEGMENT,
        bloom_semijoin_reduction,
    )

    row = bloom_semijoin_reduction(spark, SF_DIR).collect()[0]
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").where(
        F.col("c_mktsegment") == _BF_SEGMENT
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    direct = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("rev"),
    ).collect()[0]
    assert row["n_true_match"] == direct["n"]
    assert row["revenue_cents"] == direct["rev"]
    assert row["n_false_positive"] >= 0
    assert row["n_passed_bloom"] == row["n_true_match"] + row["n_false_positive"]
    assert row["n_passed_bloom"] <= row["n_orders"]
    assert 0 <= row["fill_milli"] <= 1000


def test_two_pass_percentiles_match_sorted_order_statistics(spark):
    """The histogram-refinement result must equal the k-th order
    statistic computed the naive way (full sort), for every target
    rank — and the plan must contain no global Sort of the data."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        exact_percentiles_two_pass,
    )

    got = {
        r["q_milli"]: (r["k_rank"], r["value_cents"])
        for r in exact_percentiles_two_pass(spark, SF_DIR).collect()
    }
    cents = sorted(
        r["c"]
        for r in spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .selectExpr(
            "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c"
        )
        .collect()
    )
    n = len(cents)
    for q in (500, 900, 990):
        k = (q * n + 999) // 1000
        assert got[q] == (k, cents[k - 1]), (q, got[q], k, cents[k - 1])
