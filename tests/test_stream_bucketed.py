"""Streaming -> bucketed state table end-to-end: the foreachBatch
upserts land in a bucketed managed table, and the downstream join with
the co-bucketed customer dim runs with ZERO Exchange below the join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def rolled(spark):
    out = jobs.stream_bucketed_rollup(spark, SF)
    out.collect()  # drain the stream, materialize the state table
    return spark


def test_rollup_matches_batch(rolled):
    spark = rolled
    from flights_etl_pipeline_spark.plans.registry import load

    ev = load(spark, SF, "events")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    batch = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_dec"),
        )
        .join(cust, F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
            F.sum("total_dec").cast("double").alias("total_value"),
        )
    )
    got = {
        r["segment"]: (r["n_users"], r["n_events"], r["total_value"])
        for r in jobs.bucketed_rollup_join(spark).collect()
    }
    want = {
        r["segment"]: (r["n_users"], r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want and len(got) >= 3


def test_state_dim_join_has_no_exchange_below_join(rolled):
    spark = rolled
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        state = spark.table(f"{jobs._BKT_DB}.{jobs._BKT_STATE}")
        dim = spark.table(f"{jobs._BKT_DB}.{jobs._BKT_DIM}")
        joined = state.join(dim, "user_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_state_groupby_key_has_no_exchange(rolled):
    spark = rolled
    state = spark.table(f"{jobs._BKT_DB}.{jobs._BKT_STATE}")
    agg = state.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
