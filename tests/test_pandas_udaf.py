"""UDAF surface: GROUPED_AGG pandas_udf (Arrow-batched custom aggregate).

The reference has no UDAF (SURVEY.md section 2.8); Spark's sanctioned
custom-aggregate path is the grouped-agg pandas_udf — whole group in,
scalar out, Arrow both ways. Built-ins stay preferred in hot paths
(tests/test_plans.py forbids row-wise Python); this pins the escape
hatch for aggregates SQL lacks, in both groupBy and window position.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window

SF_DIR = "/root/testdata/sf0.001"


def _trimmed_mean_udf():
    # built lazily: the pandas_udf decorator needs an active session
    @pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        """Mean after dropping the top/bottom 10% (order-insensitive)."""
        s = v.sort_values().reset_index(drop=True)
        k = int(len(s) * 0.1)
        kept = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
        return float(kept.mean())

    return trimmed_mean


def _expected(rows_by_key):
    out = {}
    for key, vals in rows_by_key.items():
        s = sorted(vals)
        k = int(len(s) * 0.1)
        kept = s[k : len(s) - k] if len(s) > 2 * k else s
        out[key] = sum(kept) / len(kept)
    return out


def test_grouped_agg_matches_local(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    got = {
        r["o_orderstatus"]: r["tm"]
        for r in orders.groupBy("o_orderstatus")
        .agg(_trimmed_mean_udf()("o_totalprice").alias("tm"))
        .collect()
    }
    rows_by_key: dict[str, list[float]] = {}
    for r in orders.select("o_orderstatus", "o_totalprice").collect():
        rows_by_key.setdefault(r[0], []).append(r[1])
    want = _expected(rows_by_key)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_grouped_agg_over_window(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    w = Window.partitionBy("o_orderstatus")
    df = orders.select(
        "o_orderkey",
        "o_orderstatus",
        _trimmed_mean_udf()("o_totalprice").over(w).alias("group_tm"),
    )
    # every row of a group carries the same aggregate
    distinct_per_group = (
        df.groupBy("o_orderstatus")
        .agg(F.countDistinct("group_tm").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in distinct_per_group)
