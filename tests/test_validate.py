"""Expectations engine: one-pass rule evaluation."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_rules_on_clean_table(spark):
    from flights_etl_pipeline_spark.functions.validate import (
        accepted_values,
        in_range,
        not_null,
        predicate,
        unique,
        validate,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    report = validate(
        orders,
        [
            not_null("o_orderkey"),
            unique("o_orderkey"),
            accepted_values("o_orderstatus", ("F", "O", "P")),
            in_range("o_totalprice", 0.0, 1e9),
            predicate("date_in_bounds", F.year("o_orderdate") >= 1990),
        ],
    )
    assert all(v == 0 for v in report.values()), report


def test_rules_catch_violations(spark):
    from flights_etl_pipeline_spark.functions.validate import (
        accepted_values,
        in_range,
        not_null,
        unique,
        validate,
    )

    df = spark.createDataFrame(
        [(1, "A", 5.0), (1, "A", -2.0), (2, None, 50.0), (3, "X", 5.0)],
        "k LONG, s STRING, v DOUBLE",
    )
    report = validate(
        df,
        [
            not_null("s"),
            unique("k"),
            accepted_values("s", ("A", "B")),
            in_range("v", 0.0, 10.0),
        ],
    )
    assert report["not_null:s"] == 1
    assert report["unique:k"] == 2  # both rows of the duplicated key
    assert report["accepted_values:s"] == 2  # the null + the 'X'
    assert report["in_range:v"] == 2  # -2.0 and 50.0


def test_unique_ignores_null_keys(spark):
    from flights_etl_pipeline_spark.functions.validate import (
        unique,
        validate,
        validate_df,
    )

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (7, 3), (7, 4), (8, 5)],
        "k INT, v INT",
    )
    # dbt/GE convention: NULL keys are not duplicates of each other
    assert validate(df, [unique("k")])["unique:k"] == 2
    row = validate_df(df, [unique("k")]).first()
    assert (row["rule"], row["violations"]) == ("unique:k", 2)


def test_validate_df_rejects_empty_rules(spark):
    import pytest

    from flights_etl_pipeline_spark.functions.validate import validate_df

    df = spark.range(3)
    with pytest.raises(ValueError, match="empty rule list"):
        validate_df(df, [])
