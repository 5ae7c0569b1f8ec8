"""Star-schema warehouse build (rebuild of loadToWarehouse.py):
dim_date, dim_airline, dim_airport, fact_flight_activities.

Reference defects fixed (SURVEY.md section 2.10):
- D5: dim_date keyed by a consistent ``date`` column; day-of-month (the
  reference's ``date_format(c, "DD")`` was day-of-year); real left-anti
  incremental load instead of the right-join+isNull that kept only
  unwritable rows.
- D6: dim_airport from the union of arrival+departure airport code arrays
  (the reference read columns that never exist).
- D7: the fact table keeps ``count_segments`` (the reference projected it
  away by computing the select list from the pre-withColumn schema).

Scale: dims are explode+distinct (shuffle on tiny key spaces, map-side
combined); the incremental load is a left-anti join against the existing
dim, which Spark broadcasts when the dim is small. The fact table is a
pure projection -- no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def build_dim_date(silver: DataFrame) -> DataFrame:
    """dim_date: distinct search/flight dates with the attribute suite
    (loadToWarehouse.py:25-40, intent per D5)."""
    dates = (
        silver.select(
            F.explode(F.array_distinct(F.array("searchDate", "flightDate"))).alias(
                "date"
            )
        )
        .filter(F.col("date").isNotNull())
        .distinct()
    )
    return dates.select(
        "date",
        F.year("date").alias("year"),
        F.month("date").alias("month"),
        F.dayofmonth("date").alias("day"),
        F.quarter("date").alias("quarter"),
        F.date_format("date", "EEEE").alias("day_name"),
        F.date_format("date", "MMMM").alias("month_name"),
        F.weekday("date").alias("weekday"),
    )


def incremental_new_rows(
    candidate: DataFrame, existing: DataFrame | None, key: str
) -> DataFrame:
    """J1: rows of ``candidate`` whose key is not yet in ``existing`` --
    the left-anti rewrite of the reference's right-join + isNull
    (loadToWarehouse.py:31-32)."""
    if existing is None:
        return candidate
    return candidate.join(existing.select(key), on=key, how="left_anti")


def build_dim_airline(silver: DataFrame) -> DataFrame:
    """dim_airline: explode zipped (code, name) arrays, distinct
    (loadToWarehouse.py:47-58)."""
    zipped = silver.select(
        F.explode(F.arrays_zip("airlineCodeArray", "airlineNameArray")).alias("z")
    )
    return (
        zipped.select(
            F.col("z.airlineCodeArray").alias("airline_code"),
            F.col("z.airlineNameArray").alias("airline_name"),
        )
        .filter(F.col("airline_code").isNotNull())
        .distinct()
    )


def build_dim_airport(silver: DataFrame) -> DataFrame:
    """dim_airport: union of arrival + departure airport codes, distinct
    (intent per defect D6 -- the reference's airportCodeArray never
    existed)."""
    arr = silver.select(F.explode("arrivalAirportArray").alias("airport_code"))
    dep = silver.select(F.explode("departureAirportArray").alias("airport_code"))
    return (
        arr.unionAll(dep)
        .filter(F.col("airport_code").isNotNull() & (F.col("airport_code") != ""))
        .distinct()
    )


def build_fact(silver: DataFrame) -> DataFrame:
    """fact_flight_activities: all non-array columns + count_segments
    (D7 fixed: the measure survives the projection)."""
    with_measure = silver.withColumn(
        "count_segments", F.size("airlineCodeArray")
    )
    flat_cols = [
        f.name
        for f in with_measure.schema.fields
        if not isinstance(f.dataType, ArrayType)
    ]
    return with_measure.select(*flat_cols)
