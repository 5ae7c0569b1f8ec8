"""Medallion pipeline runner: bronze -> silver -> gold -> warehouse.

Replaces the reference's Airflow DAG + four spark-submit jobs
(mnt/airflow/dags/flight_pipeline.py:26-95) with an in-process call graph:
orchestration added no query semantics, so each stage is a plain function
and the DAG is Python control flow. Every stage remains a pure
``DataFrame -> DataFrame`` transform; this module owns all IO.

Layout under ``lake_root``:
    bronze/flights/      raw + year/month/day partitions (append)
    silver/flights/      cleaned/typed with arrays       (append)
    gold/<table>/        business aggregates             (overwrite)
    warehouse/<dim|fact> star schema                     (incremental dims)
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.operators import gold, silver, warehouse
from flights_etl_pipeline_spark.sources.readers import (
    high_watermark,
    path_exists,
    read_parquet_table,
)
from flights_etl_pipeline_spark.sources.sinks import write_partitioned_parquet


@dataclass
class PipelineResult:
    bronze_rows: int
    silver_rows: int
    gold_revenue_rows: int
    gold_fbc_rows: int
    dim_date_rows: int
    dim_airline_rows: int
    dim_airport_rows: int
    fact_rows: int


def run_bronze(
    spark: SparkSession, source: DataFrame, lake_root: str
) -> DataFrame:
    """Bronze: land raw rows with partition columns; incremental via
    high-watermark on ``index`` (ingestToBronze.py:59-84, defects D1
    fixed by construction -- no stale-bound loop)."""
    path = f"{lake_root}/bronze/flights"
    incoming = source
    if path_exists(spark, path):
        wm = high_watermark(read_parquet_table(spark, path), "index")
        if wm is not None:
            incoming = source.filter(F.col("index") > F.lit(int(wm)))
    staged = silver.with_partition_cols(
        incoming.withColumn("searchDate", F.to_date("searchDate", "yyyy-MM-dd")),
        "searchDate",
    ).withColumn("searchDate", F.col("searchDate").cast("string"))
    write_partitioned_parquet(staged, path, ("year", "month", "day"))
    return read_parquet_table(spark, path)


def run_silver(spark: SparkSession, lake_root: str) -> DataFrame:
    """Silver: clean/type/arrays over bronze, partitioned append
    (transformToSilver.py rebuilt; single write, no chunk loop)."""
    bronze = read_parquet_table(spark, f"{lake_root}/bronze/flights")
    out = silver.to_silver(bronze.drop("year", "month", "day"))
    out = silver.with_partition_cols(out, "searchDate")
    write_partitioned_parquet(
        out, f"{lake_root}/silver/flights", ("year", "month", "day"), mode="overwrite"
    )
    return read_parquet_table(spark, f"{lake_root}/silver/flights")


def run_gold(
    spark: SparkSession, lake_root: str, as_of: dt.date
) -> tuple[DataFrame, DataFrame]:
    """Gold: the two business aggregates (updateToGold.py rebuilt;
    overwrite -- they are full recomputes, and AQE sizes the output
    instead of repartition(10000))."""
    sil = read_parquet_table(spark, f"{lake_root}/silver/flights")
    # one cached pass feeds both aggregates (the reference persists silver
    # for the same reason, updateToGold.py:28)
    sil = sil.persist()
    try:
        rev = gold.revenue_by_year_month_airline(sil, as_of)
        rev.write.mode("overwrite").parquet(
            f"{lake_root}/gold/revenue_n_seat_remain_ym"
        )
        fbc = gold.fare_basis_duration(sil)
        fbc.write.mode("overwrite").parquet(
            f"{lake_root}/gold/fbc_travel_duration_relation"
        )
    finally:
        sil.unpersist()
    return (
        read_parquet_table(spark, f"{lake_root}/gold/revenue_n_seat_remain_ym"),
        read_parquet_table(spark, f"{lake_root}/gold/fbc_travel_duration_relation"),
    )


def run_warehouse(spark: SparkSession, lake_root: str) -> dict[str, DataFrame]:
    """Warehouse: incremental dims (left-anti vs existing) + fact append."""
    sil = read_parquet_table(spark, f"{lake_root}/silver/flights").persist()
    out: dict[str, DataFrame] = {}
    try:
        for name, build, key in (
            ("dim_date", warehouse.build_dim_date, "date"),
            ("dim_airline", warehouse.build_dim_airline, "airline_code"),
            ("dim_airport", warehouse.build_dim_airport, "airport_code"),
        ):
            path = f"{lake_root}/warehouse/{name}"
            candidate = build(sil)
            existing = (
                read_parquet_table(spark, path) if path_exists(spark, path) else None
            )
            new_rows = warehouse.incremental_new_rows(candidate, existing, key)
            new_rows.write.mode("append").parquet(path)
            out[name] = read_parquet_table(spark, path)

        fact = warehouse.build_fact(sil)
        fact_path = f"{lake_root}/warehouse/fact_flight_activities"
        fact.write.mode("overwrite").parquet(fact_path)
        out["fact_flight_activities"] = read_parquet_table(spark, fact_path)
    finally:
        sil.unpersist()
    return out


def run_pipeline(
    spark: SparkSession,
    source: DataFrame,
    lake_root: str,
    as_of: dt.date,
) -> PipelineResult:
    """Full bronze -> silver -> gold -> warehouse run (the DAG's edges,
    flight_pipeline.py:94-95, as plain sequencing)."""
    bronze = run_bronze(spark, source, lake_root)
    sil = run_silver(spark, lake_root)
    rev, fbc = run_gold(spark, lake_root, as_of)
    wh = run_warehouse(spark, lake_root)
    return PipelineResult(
        bronze_rows=bronze.count(),
        silver_rows=sil.count(),
        gold_revenue_rows=rev.count(),
        gold_fbc_rows=fbc.count(),
        dim_date_rows=wh["dim_date"].count(),
        dim_airline_rows=wh["dim_airline"].count(),
        dim_airport_rows=wh["dim_airport"].count(),
        fact_rows=wh["fact_flight_activities"].count(),
    )
