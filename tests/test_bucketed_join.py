"""Bucketed tables eliminate the join/agg shuffle — the plan-level
proof of the repo's "bucket both sides on the join key at 100 TB"
posture.

Writes orders and customer bucketed on the customer key with the same
bucket count, then asserts:

1. the orders<->customer equi-join plan contains ZERO Exchange
   operators (broadcast disabled, so absent bucketing this would be a
   two-Exchange sort-merge join);
2. with ``sortBy`` on the bucket key, the join also needs no per-side
   Sort (bucket files are pre-sorted);
3. a groupBy on the bucket key aggregates with no Exchange (partial ==
   final, single stage).

Uses the session catalog (in-process Derby metastore via the shared
test session) — bucketing metadata lives in the table catalog, not the
parquet files, so saveAsTable is required; a plain parquet write would
silently drop the bucket spec.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.sources.sinks import (
    ensure_database,
    write_bucketed_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    ensure_database(spark, "bdb")
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_bucketed_table(
        orders, "bdb", "orders_b", "o_custkey", 8, sort_col="o_custkey"
    )
    write_bucketed_table(
        cust, "bdb", "customer_b", "c_custkey", 8, sort_col="c_custkey"
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS bdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS bdb.customer_b")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    with _no_broadcast(spark):
        j = spark.table("bdb.orders_b").join(
            spark.table("bdb.customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _plan(j)
    assert "Exchange" not in plan, plan
    # and the join result is still correct
    expected = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert j.count() == expected


def test_cobucketed_sorted_join_has_no_sort(bucketed):
    # Since Spark 3.0 the scan reports its sorted-bucket ordering only
    # under this flag (SPARK-28169 made the one-file-per-bucket check
    # opt-in); write_bucketed_table guarantees the one-file layout, so
    # enabling it is safe and eliminates the per-side Sort too.
    spark = bucketed
    prev = spark.conf.get(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
    )
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        with _no_broadcast(spark):
            j = spark.table("bdb.orders_b").join(
                spark.table("bdb.customer_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = _plan(j)
    finally:
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", prev
        )
    assert "SortMergeJoin" in plan, plan
    # no per-side Sort: bucket files are pre-sorted, one file per bucket
    assert "Sort " not in plan.replace("SortMergeJoin", ""), plan
    assert "Exchange" not in plan, plan


def test_groupby_on_bucket_key_has_no_exchange(bucketed):
    spark = bucketed
    agg = (
        spark.table("bdb.orders_b")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    plan = _plan(agg)
    assert "Exchange" not in plan, plan


class _no_broadcast:
    """Temporarily disable broadcast joins so the shuffle-free claim is
    tested against the sort-merge path (broadcast would trivially avoid
    an Exchange on the small side while still shuffling nothing —
    hiding a missing bucket match)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self.spark

    def __exit__(self, *exc):
        self.spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", self.prev
        )
