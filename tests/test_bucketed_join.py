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

Also restores the original fact-fact suite (orders x lineitem bucketed
on the orderkey): no join-key exchange under a forced sort-merge join,
result equality with the unbucketed join, and 1-of-N bucket pruning on
a point predicate over the bucket key.

Uses the session catalog (in-process Derby metastore via the shared
test session) — bucketing metadata lives in the table catalog, not the
parquet files, so saveAsTable is required; a plain parquet write would
silently drop the bucket spec.
"""

from __future__ import annotations

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


# ---------------------------------------------------------------------------
# Fact-fact suite (restored round-2 coverage): orders x lineitem on orderkey
# ---------------------------------------------------------------------------

N_BUCKETS = 8


@pytest.fixture(scope="module")
def fact_bucketed(spark, tmp_path_factory):
    """orders + lineitem bucketed by orderkey into the test catalog."""
    wh = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_db")
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{SF}/{tbl}.parquet")
        (
            df.write.mode("overwrite")
            .option("path", str(wh / tbl))
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(f"bucket_db.{tbl}_b")
        )
    yield "bucket_db"
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS bucket_db.{t}")
    spark.sql("DROP DATABASE IF EXISTS bucket_db")


def test_bucketed_join_has_no_shuffle(spark, fact_bucketed):
    # hint forces the fact-fact strategy sf0.001 would otherwise broadcast;
    # at real scale neither side fits in memory and SMJ is what Spark picks
    o = spark.table("bucket_db.orders_b").hint("merge")
    li = spark.table("bucket_db.lineitem_b")
    joined = o.join(
        li, o.o_orderkey == li.l_orderkey
    ).groupBy("o_orderpriority").agg(F.sum("l_quantity").alias("qty"))
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}" in plan
    # both join inputs come straight from bucketed scans: no exchange in
    # the plan repartitions on the join key (the only allowed exchange is
    # the final aggregate's, keyed by o_orderpriority)
    for ln in plan.splitlines():
        if "hashpartitioning(" in ln:
            assert "orderkey" not in ln, f"join-key shuffle survived: {ln}"


def test_bucketed_join_matches_unbucketed(spark, fact_bucketed):
    o_raw = spark.read.parquet(f"{SF}/orders.parquet")
    li_raw = spark.read.parquet(f"{SF}/lineitem.parquet")
    expected = (
        o_raw.join(li_raw, o_raw.o_orderkey == li_raw.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    got = (
        spark.table("bucket_db.orders_b")
        .join(
            spark.table("bucket_db.lineitem_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))


def test_bucket_pruning_on_key_predicate(spark, fact_bucketed):
    """A point predicate on the bucket key scans 1 of N buckets."""
    # DisableUnnecessaryBucketedScan would demote this single-table scan
    # to a plain parquet read; force the bucketed scan so the point
    # predicate can prune to one bucket file group
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        li = spark.table("bucket_db.lineitem_b").filter(
            F.col("l_orderkey") == 1
        )
        plan = _plan(li)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan
    finally:
        spark.conf.set(key, prev)
