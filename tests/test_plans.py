"""Physical-plan assertions (SURVEY.md section 5.5): the scale claims —
pushdown, pruning, broadcast, codegen, no row-at-a-time Python — must
survive refactors, so they are pinned here rather than trusted.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_parquet_filter_pushdown(spark):
    from flights_etl_pipeline_spark.plans.queries_core import filtered_revenue

    plan = plan_str(filtered_revenue(spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # the quantity/discount predicates reach the scan, not just the Filter node
    assert "l_quantity" in plan.split("PushedFilters")[1].split("]")[0]


def test_column_pruning_reaches_scan(spark):
    from flights_etl_pipeline_spark.plans.queries_core import pricing_summary

    plan = plan_str(pricing_summary(spark, SF_DIR))
    scan_schema = plan.split("ReadSchema")[1].splitlines()[0]
    # lineitem has 16 columns; the scan must read only what Q1 needs
    assert "l_comment" not in scan_schema
    assert "l_orderkey" not in scan_schema
    assert "l_quantity" in scan_schema


def test_small_dim_join_broadcasts(spark):
    from flights_etl_pipeline_spark.plans.queries_core import revenue_by_nation

    plan = plan_str(revenue_by_nation(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nation/customer dims must not SMJ


def test_hot_path_stays_in_codegen(spark):
    from flights_etl_pipeline_spark.plans.queries_core import pricing_summary

    # AQE shows only the placeholder in simple mode pre-execution; codegen
    # mode compiles the current plan and reports its codegen subtrees
    plan = plan_str(pricing_summary(spark, SF_DIR), mode="codegen")
    assert "WholeStageCodegen" in plan


@pytest.mark.parametrize(
    "exclude_prefix", [("events_hourly_stream", "events_sessionize_stream")]
)
def test_no_rowwise_python_udf_in_any_registered_plan(spark, exclude_prefix):
    """BatchEvalPython = row-at-a-time Python UDF, the forbidden slow path.
    Arrow batch nodes (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    are the sanctioned Python surface."""
    from flights_etl_pipeline_spark.plans.registry import REGISTRY

    for name, spec in REGISTRY.items():
        if name.startswith(exclude_prefix):  # streaming queries execute on call
            continue
        plan = plan_str(spec.fn(spark, SF_DIR), mode="simple")
        assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    """A year=/month= filter must prune partitions at scan time (the
    reference's whole lake layout depends on this, ingestToBronze.py:79-84)."""
    from flights_etl_pipeline_spark.sources.sinks import write_partitioned_parquet

    df = spark.range(100).select(
        F.col("id"),
        (F.lit(2022) + F.col("id") % 2).cast("int").alias("year"),
        (F.col("id") % 12 + 1).cast("int").alias("month"),
        (F.col("id") % 28 + 1).cast("int").alias("day"),
    )
    path = str(tmp_path / "lake")
    write_partitioned_parquet(df, path, mode="overwrite")
    scan = spark.read.parquet(path).filter((F.col("year") == 2022) & (F.col("month") == 3))
    plan = plan_str(scan)
    pf = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "year" in pf and "month" in pf
