"""Physical-plan assertions for the TPC-H decision-support shapes.

The module's docstrings make specific scale claims — EXISTS/NOT EXISTS
run as semi/anti joins, top-k is TakeOrderedAndProject, Q18 scans
lineitem once, filters push to scans. Pin them.
"""

from __future__ import annotations

from tests.test_plans import SF_DIR, plan_str


def test_q4_exists_is_semi_join_with_pushed_date_filter(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import q4_order_priority

    plan = plan_str(q4_order_priority(spark, SF_DIR))
    assert "LeftSemi" in plan
    # the date window reaches the orders parquet scan
    assert "PushedFilters" in plan


def test_q21_decorrelates_to_counts_no_self_join(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q21_single_return_supplier,
    )

    plan = plan_str(q21_single_return_supplier(spark, SF_DIR), mode="simple")
    # double-EXISTS collapses to per-order counts: one lineitem scan,
    # a window over the agg's own partitioning, no semi/anti SELF-join
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
    assert "LeftSemi" in plan  # the orders('F') existence check remains
    assert "LeftAnti" not in plan


def test_q22_not_exists_is_anti_join(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import q22_idle_customers

    plan = plan_str(q22_idle_customers(spark, SF_DIR))
    assert "LeftAnti" in plan
    # the one-row scalar average arrives via a broadcast, not a shuffle
    assert "Broadcast" in plan


def test_q3_q10_topk_avoid_global_sort(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q3_shipping_priority,
        q10_returned_items,
    )

    for fn in (q3_shipping_priority, q10_returned_items):
        plan = plan_str(fn(spark, SF_DIR))
        assert "TakeOrderedAndProject" in plan, fn.__name__


def test_q18_reuses_single_lineitem_scan(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q18_large_volume_customers,
    )

    plan = plan_str(q18_large_volume_customers(spark, SF_DIR), mode="simple")
    assert plan.count("lineitem.parquet") <= 1


def test_q13_filter_applies_before_outer_join(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q13_customer_distribution,
    )

    plan = plan_str(q13_customer_distribution(spark, SF_DIR))
    assert "LeftOuter" in plan
    # the ON-clause priority filter lands on the orders side pre-join
    assert "4-NOT SPECIFIED" in plan


def test_q5_q8_q9_dims_broadcast(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q5_local_supplier_volume,
        q8_market_share,
        q9_profit_by_nation_year,
    )

    for fn in (
        q5_local_supplier_volume,
        q8_market_share,
        q9_profit_by_nation_year,
    ):
        plan = plan_str(fn(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan, fn.__name__


def test_q9_part_type_filter_pushes_to_scan(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q9_profit_by_nation_year,
    )

    plan = plan_str(q9_profit_by_nation_year(spark, SF_DIR))
    pushed = [
        seg.split("]")[0]
        for seg in plan.split("PushedFilters: [")[1:]
    ]
    assert any("p_type" in p for p in pushed)


def test_q2_topk_and_broadcast_dims(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q2_min_cost_supplier,
    )

    plan = plan_str(q2_min_cost_supplier(spark, SF_DIR))
    # correlated MIN decorrelates to agg + join-back, top-100 stays
    # TakeOrderedAndProject; region-filtered supplier dim broadcasts
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # the size filter reaches the part scan, and the broadcast part
    # join sits BELOW the derived-partsupp aggregate so the agg runs
    # over the ~1-in-50 filtered lineitem rows, not the full table
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("p_size" in p for p in pushed)
    simple = plan_str(q2_min_cost_supplier(spark, SF_DIR), mode="simple")
    # bottom-most operator order: the deepest BroadcastHashJoin (the
    # part filter join) prints below the deepest HashAggregate (the
    # partial partsupp agg)
    assert simple.rindex("HashAggregate") < simple.rindex("BroadcastHashJoin")


def test_q16_not_in_is_anti_join_with_pushed_part_filters(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q16_part_supplier_counts,
    )

    plan = plan_str(q16_part_supplier_counts(spark, SF_DIR))
    assert "LeftAnti" in plan
    pushed = [seg.split("]")[0] for seg in plan.split("PushedFilters: [")[1:]]
    assert any("p_size" in p for p in pushed)


def test_q20_semi_join_and_aqe_reuses_q_exchange(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q20_excess_share_suppliers,
    )

    df = q20_excess_share_suppliers(spark, SF_DIR)
    assert "LeftSemi" in plan_str(df)
    # the (partkey, suppkey) aggregate feeds both `tot` and the join;
    # AQE must reuse that exchange rather than recompute the scan+agg
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed


def test_q11_scalar_total_arrives_by_broadcast(spark):
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q11_important_parts,
    )

    plan = plan_str(q11_important_parts(spark, SF_DIR))
    assert "Broadcast" in plan


def test_no_forced_broadcast_on_sf_linear_tables(spark):
    """Round-4 verdict item 1: customer/supplier/part (SF-linear) must
    carry NO explicit broadcast hint. Proof is semantic, not textual:
    with size-based auto-broadcast disabled, a hinted join would STILL
    plan as BroadcastHashJoin (hints override the threshold), so the
    star joins falling back to a shuffled join proves the hint is gone
    — which is exactly the AQE escape hatch the 100 TB target needs.
    With defaults restored, AQE/static stats still pick broadcast at
    test SF (pinned by test_q5_q8_q9_dims_broadcast above)."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        revenue_by_nation,
    )
    from flights_etl_pipeline_spark.plans.queries_tpch import (
        q3_shipping_priority,
        q5_local_supplier_volume,
        q9_profit_by_nation_year,
        q10_returned_items,
        q18_large_volume_customers,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for fn in (
            revenue_by_nation,
            q3_shipping_priority,
            q5_local_supplier_volume,
            q9_profit_by_nation_year,
            q10_returned_items,
            q18_large_volume_customers,
        ):
            plan = plan_str(fn(spark, SF_DIR), mode="simple")
            assert (
                "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            ), f"{fn.__name__}: no shuffled join — an SF-linear dim is hinted"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
