"""Bucketed co-located join: the shuffle-elimination strategy for a join
both of whose sides are fact-sized (broadcast impossible).

The reference's only join is dim-sized (loadToWarehouse.py:31-32,
broadcast territory); at 100 TB the fact-fact joins (orders x lineitem
here) shuffle both sides on every query unless the tables are written
pre-bucketed on the join key. ``bucketBy(N, key)`` at write time gives
every future join/aggregate on that key a shuffle-free plan -- pay the
shuffle once at ingest, never again. This is the highest-leverage layout
decision a 100 TB warehouse makes, so it is pinned by a plan test.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"
N_BUCKETS = 8


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    """Write orders+lineitem bucketed by orderkey into the test catalog."""
    wh = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql("CREATE DATABASE IF NOT EXISTS bucket_db")
    for tbl, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        df = spark.read.parquet(f"{SF_DIR}/{tbl}.parquet")
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


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
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


def test_bucketed_join_matches_unbucketed(spark, bucketed_tables):
    o_raw = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li_raw = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
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


def test_bucket_pruning_on_key_predicate(spark, bucketed_tables):
    """A point predicate on the bucket key scans 1 of N buckets."""
    # DisableUnnecessaryBucketedScan would demote this single-table scan
    # to a plain parquet read; force the bucketed scan so the point
    # predicate can prune to one bucket file group
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        li = spark.table("bucket_db.lineitem_b").filter(F.col("l_orderkey") == 1)
        plan = _plan(li)
        assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan
    finally:
        spark.conf.set(key, prev)
