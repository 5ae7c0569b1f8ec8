"""write_with_metrics: observe-based single-pass quality counters."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_write_with_metrics_counts_match(spark, tmp_path):
    from flights_etl_pipeline_spark.sources.sinks import write_with_metrics

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "maybe_null",
        F.when(F.col("o_orderkey") % 7 == 0, None).otherwise(
            F.col("o_orderkey")
        ),
    )
    out = str(tmp_path / "obs_out")
    metrics = write_with_metrics(df, out, count_col="maybe_null")

    expected_rows = df.count()
    expected_nulls = df.filter(F.col("maybe_null").isNull()).count()
    assert metrics["n_rows"] == expected_rows
    assert metrics["n_nulls"] == expected_nulls
    # and the write itself landed intact
    assert spark.read.parquet(out).count() == expected_rows


def test_write_with_metrics_no_count_col(spark, tmp_path):
    from flights_etl_pipeline_spark.sources.sinks import write_with_metrics

    df = spark.range(100)
    metrics = write_with_metrics(df, str(tmp_path / "obs2"))
    assert metrics == {"n_rows": 100}
