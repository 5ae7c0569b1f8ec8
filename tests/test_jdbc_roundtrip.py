"""S1 integration: partitioned JDBC read against a live database.

The reference's front door is a JDBC ingest of the OLTP source
(ingestToBronze.py:43-74, a sequential BETWEEN-slice loop).
``read_jdbc_partitioned`` rebuilds it as Spark's parallel range read;
until now it had only unit-level coverage because the sandbox has no
Postgres. Spark's classpath ships embedded Derby (the metastore
engine), so an in-memory Derby database gives a real JDBC round-trip
with zero new dependencies: write a table through ``df.write.jdbc``,
read it back partitioned, assert equality and actual partition count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flights_etl_pipeline_spark.sources.readers import read_jdbc_partitioned

DERBY_URL = "jdbc:derby:memory:s1testdb;create=true"
DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def _seed_orders(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


def test_jdbc_roundtrip_partitioned(spark, sf_dir):
    src = _seed_orders(spark, sf_dir)
    src.write.jdbc(DERBY_URL, "ORDERS_RT", mode="overwrite", properties=DERBY_PROPS)

    lo, hi = 0, src.agg(F.max("o_orderkey")).collect()[0][0]
    got = read_jdbc_partitioned(
        spark,
        DERBY_URL,
        "ORDERS_RT",
        partition_column="o_orderkey",
        lower_bound=lo,
        upper_bound=hi,
        num_partitions=4,
        properties=DERBY_PROPS,
    )

    # N concurrent range partitions, not one serial scan
    assert got.rdd.getNumPartitions() == 4

    assert got.count() == src.count()
    diff_a = src.exceptAll(got)
    diff_b = got.exceptAll(src)
    assert diff_a.isEmpty() and diff_b.isEmpty()


def test_jdbc_predicate_pushdown(spark, sf_dir):
    """The partitioned reader keeps filter pushdown: a post-read filter
    must reach the JDBC source (PushedFilters in the scan node)."""
    src = _seed_orders(spark, sf_dir)
    # Derby's default mapping for StringType is CLOB, which cannot appear
    # in a pushed-down comparison; declare a comparable VARCHAR instead.
    (
        src.write.option("createTableColumnTypes", "o_orderstatus VARCHAR(4)")
        .jdbc(DERBY_URL, "ORDERS_PD", mode="overwrite", properties=DERBY_PROPS)
    )
    got = read_jdbc_partitioned(
        spark,
        DERBY_URL,
        "ORDERS_PD",
        partition_column="o_orderkey",
        lower_bound=0,
        upper_bound=1000,
        num_partitions=3,
        properties=DERBY_PROPS,
    ).filter(F.col("o_orderstatus") == "F")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan
    expected = src.filter(F.col("o_orderstatus") == "F").count()
    assert got.count() == expected
