"""Round-10 guard mechanisms (round-9 ADVICE items).

Each test pins a fail-loudly or degenerate-input behavior added in
round 10: the OHLC packed-ordering-key precondition, the zscore
sum-of-squares overflow guard, the runs-test degenerate-series NULL,
and the k-core empty-set fixpoint.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.queries_events import _checked_event_id


def test_ohlc_packed_key_guard_raises_on_wide_event_id(spark):
    df = spark.createDataFrame([(2147483648,)], "event_id LONG").select(
        _checked_event_id().alias("eid")
    )
    with pytest.raises(Exception, match="event_id"):
        df.collect()


def test_ohlc_packed_key_guard_passes_valid_ids(spark):
    rows = spark.createDataFrame(
        [(0,), (7,), (2147483647,)], "event_id LONG"
    ).select(_checked_event_id().alias("eid")).collect()
    assert [r["eid"] for r in rows] == [0, 7, 2147483647]


def test_ohlc_packed_key_guard_negative_only_for_stream(spark):
    # batch path: negative ids are an error
    neg = spark.createDataFrame([(-5,)], "event_id LONG")
    with pytest.raises(Exception, match="event_id"):
        neg.select(_checked_event_id().alias("eid")).collect()
    # stream path: sentinels carry negative ids and are allowed through
    got = neg.select(
        _checked_event_id(allow_negative=True).alias("eid")
    ).collect()
    assert got[0]["eid"] == -5


def _run_zscore_batch(values, state_tuple):
    """Drive zscore_state_fn directly with a fake GroupState."""
    from flights_etl_pipeline_spark.streaming.jobs import zscore_state_fn

    class FakeState:
        def __init__(self, t):
            self._t = t

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = t

    pdf = pd.DataFrame(
        {
            "user_id": [1] * len(values),
            "event_id": list(range(len(values))),
            "ts": pd.to_datetime(
                np.arange(len(values)), unit="s", utc=True
            ).tz_localize(None),
            "value": values,
        }
    )
    st = FakeState(state_tuple)
    out = list(zscore_state_fn((1,), [pdf], st))
    return out, st._t


def test_zscore_overflow_guard_raises_before_wrap():
    # a prior sumsq near 2^62 plus any new history must fail loudly,
    # never wrap silently (numpy int64 wraps without error)
    with pytest.raises(OverflowError, match="sum-of-squares"):
        _run_zscore_batch([1e6], (10, 10**9, 2**62 - 1))


def test_zscore_overflow_guard_rejects_huge_values():
    # |milli-quantized value| >= isqrt(2^63) would overflow per-element
    with pytest.raises(OverflowError, match="sum-of-squares"):
        _run_zscore_batch([3.1e6], (0, 0, 0))


def test_zscore_normal_path_still_works():
    out, state = _run_zscore_batch([1.0, 1.0, 1.0, 100.0], (0, 0, 0))
    # state folded all 4 values exactly
    assert state == (4, 1000 + 1000 + 1000 + 100000, 3 * 1000**2 + 100000**2)


def test_runs_test_degenerate_series_emits_null(spark, tmp_path):
    """A 2-day series (one above, one below the median) has n1=n2=1 ->
    var=0; z must be NULL, not Inf, on both engines."""
    import duckdb

    from flights_etl_pipeline_spark.plans.queries_core import (
        RUNS_TEST_SQL,
        orders_runs_test,
    )

    pdf = pd.DataFrame(
        {
            "o_orderkey": [1, 2],
            "o_custkey": [1, 1],
            "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-02"]).date,
            "o_totalprice": [10.0, 20.0],
        }
    )
    d = str(tmp_path / "orders.parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)
    got = orders_runs_test(spark, str(tmp_path)).collect()[0]
    assert got["n1"] == 1 and got["n2"] == 1
    assert got["z_stat"] is None
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d}/*.parquet'")
    oz = con.execute(RUNS_TEST_SQL).fetchone()
    assert oz[3] is None


def test_kcore_empty_peel_is_fixpoint(spark, tmp_path, monkeypatch):
    """A graph where every node has degree < k peels to empty in one
    round; that IS the fixpoint — no spurious max-rounds assertion."""
    from flights_etl_pipeline_spark.plans import queries_graph as qg

    orders = pd.DataFrame(
        {"o_orderkey": [1, 2], "o_custkey": [11, 12]}
    )
    li = pd.DataFrame({"l_orderkey": [1, 2], "l_suppkey": [21, 22]})
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    # force the peel to empty on the FINAL allowed round: 1 round max,
    # and every node has degree 1 < k
    monkeypatch.setattr(qg, "_KCORE_MAX_ROUNDS", 1)
    out = qg.copurchase_kcore(spark, str(tmp_path))
    assert out.count() == 0
