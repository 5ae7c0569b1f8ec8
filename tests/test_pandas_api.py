"""pandas API on Spark (pyspark.pandas): the drop-in surface for
pandas-fluent users — same engine, same plans, pandas ergonomics."""

from __future__ import annotations

import pyspark.pandas as ps
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_pandas_api_groupby_matches_sql(spark):
    ps.set_option("compute.default_index_type", "distributed")
    pdf = ps.read_parquet(f"{SF_DIR}/orders.parquet")
    got = (
        pdf.groupby("o_orderstatus")["o_totalprice"]
        .count()
        .to_pandas()
        .sort_index()
    )
    want = {
        r["o_orderstatus"]: r["n"]
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {k: int(v) for k, v in got.items()} == want


def test_pandas_api_to_spark_roundtrip(spark):
    pdf = ps.read_parquet(f"{SF_DIR}/nation.parquet")
    sdf = pdf.to_spark()
    assert sdf.count() == 25
    back = sdf.pandas_api()
    assert len(back) == 25
