"""Join-strategy hints: the manual override surface for when stats lie.

At 100 TB the optimizer's size estimates can be wrong (post-filter
selectivity, UDF-derived columns); hints are the documented escape
hatch. Pin that each hint actually flips the physical strategy."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import SF_DIR, plan_str


def _sides(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    return orders, cust


def test_merge_hint_forces_sort_merge(spark):
    orders, cust = _sides(spark)
    j = orders.join(
        cust.hint("merge"), orders.o_custkey == cust.c_custkey
    )
    plan = plan_str(j)
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_shuffle_hash_hint_forces_hash_join(spark):
    orders, cust = _sides(spark)
    j = orders.join(
        cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey
    )
    plan = plan_str(j)
    assert "ShuffledHashJoin" in plan


def test_broadcast_hint_wins_over_size(spark):
    orders, cust = _sides(spark)
    # hint by name through the SQL surface too
    orders.createOrReplaceTempView("o_hint")
    cust.createOrReplaceTempView("c_hint")
    plan = plan_str(
        spark.sql(
            "SELECT /*+ BROADCAST(c_hint) */ * FROM o_hint "
            "JOIN c_hint ON o_custkey = c_custkey"
        )
    )
    assert "BroadcastHashJoin" in plan
