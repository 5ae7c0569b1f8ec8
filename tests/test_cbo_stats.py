"""ANALYZE TABLE statistics: the CBO's food at warehouse scale.

Partitioned lakes live or die by estimates: a join order or broadcast
decision keyed off a wildly wrong size estimate melts at 100 TB. Pin
the stats pipeline: ANALYZE writes rowCount/sizeInBytes to the catalog,
the optimizer's plan estimates pick them up, and column-level stats
(distinct counts) land for join-cardinality estimation."""

from __future__ import annotations

import pytest


@pytest.fixture
def stats_table(spark):
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").write.mode(
        "overwrite"
    ).saveAsTable("cbo_orders")
    yield "cbo_orders"
    spark.sql("DROP TABLE IF EXISTS cbo_orders")


def test_analyze_populates_catalog_and_plan_estimates(spark, stats_table):
    spark.sql(
        f"ANALYZE TABLE {stats_table} COMPUTE STATISTICS "
        "FOR COLUMNS o_orderkey, o_orderstatus"
    )
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {stats_table}").collect()
    }
    assert "Statistics" in desc and "rows" in desc["Statistics"]

    true_rows = spark.table(stats_table).count()
    # the optimizer's estimate must equal the analyzed row count
    # (rowCount propagates into plan stats only under the CBO flag)
    saved = spark.conf.get("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try:
        est = (
            spark.table(stats_table)
            ._jdf.queryExecution()
            .optimizedPlan()
            .stats()
            .rowCount()
        )
        assert est.isDefined()
        assert int(str(est.get())) == true_rows
    finally:
        spark.conf.set("spark.sql.cbo.enabled", saved)

    # column stats: distinct-count estimate for the join key is sane
    col_desc = spark.sql(
        f"DESCRIBE EXTENDED {stats_table} o_orderkey"
    ).collect()
    info = {r["info_name"]: r["info_value"] for r in col_desc}
    assert info.get("distinct_count") is not None
    ndv = int(info["distinct_count"])
    assert abs(ndv - true_rows) / true_rows < 0.1  # keys are unique
