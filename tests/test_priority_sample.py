"""orders_priority_sample (Duffield-Lund-Thorup): plan shape + invariants.

The parity gate proves value equality vs DuckDB; these tests pin the two
things parity can't see -- that the global top-(k+1) really plans as a
per-task heap (TakeOrderedAndProject, never a global Sort over an
Exchange SinglePartition), and the estimator's structural guarantees
(est >= w for every sampled row; the deterministic md5-driven draw keeps
the estimate of the total inside the ~1/sqrt(k) band the theorem
promises in expectation).
"""

from __future__ import annotations

import contextlib
import io

from flights_etl_pipeline_spark.plans.queries_ml import (
    _PRI_SAMPLE_K,
    orders_priority_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_topk_plans_as_heap_not_global_sort(spark):
    df = orders_priority_sample(spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    # the scale killer this query exists to avoid: a full sort funneled
    # through one task
    for i, ln in enumerate(lines := plan.splitlines()):
        if "Exchange SinglePartition" in ln:
            above = " ".join(lines[max(0, i - 3) : i])
            assert "Sort" not in above, "global sort over single partition"


def test_scan_prunes_to_two_columns(spark):
    plan = _plan(orders_priority_sample(spark, SF_DIR))
    assert "o_orderkey" in plan and "o_totalprice" in plan
    assert "o_comment" not in plan and "o_custkey" not in plan


def test_range_partition_plan_sample_is_heap_topk(spark):
    """range_partition_plan shares the heap-top-k discipline: its fixed
    boundary sample must plan as TakeOrderedAndProject, and the only
    window may run over that bounded sample -- never the table."""
    from flights_etl_pipeline_spark.plans.queries_core import (
        range_partition_plan,
    )

    df = range_partition_plan(spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert 1 <= len(rows) <= 8
    total = sum(r.n_rows for r in rows)
    # load_milli is per-bucket share scaled by 8*1000/total
    for r in rows:
        assert r.load_milli == (r.n_rows * 8000) // total


def test_estimator_invariants(spark):
    rows = orders_priority_sample(spark, SF_DIR).collect()
    # exactly k sampled (a priority tie at the boundary could drop more,
    # but the fixed md5 draw on this fixed table yields the full k)
    assert len(rows) == _PRI_SAMPLE_K
    assert len({r.o_orderkey for r in rows}) == len(rows)
    # max(w, tau) >= w, scaled to milli-units
    assert all(r.est_milli >= r.w_cents * 1000 for r in rows)
    # unbiasedness band: sum of estimates ~ true total weight; with
    # k=200 the relative SE is ~7 %, and the draw is deterministic, so
    # a +-30 % band can never flake
    from pyspark.sql import functions as F

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    total_cents = (
        orders.select(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("t")
        ).collect()[0].t
    )
    est_total_cents = sum(r.est_milli for r in rows) / 1000.0
    assert 0.7 * total_cents < est_total_cents < 1.3 * total_cents
