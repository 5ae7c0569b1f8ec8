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
