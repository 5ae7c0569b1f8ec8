"""Gold aggregates (rebuild of updateToGold.py).

Two business tables:
- ``revenue_n_seat_remain_ym``: single-airline itineraries only, grouped
  by (year, month, airline) -> sum(totalFare), round(avg(seatsRemaining),2)
  (updateToGold.py:29-41).
- ``fbc_travel_duration_relation``: fareBasisCode -> round(avg minutes, 2)
  (updateToGold.py:50-52).

Determinism fix (SURVEY.md P6): the reference filters with driver-side
``date.today()`` (updateToGold.py:35); here "today" is an explicit
``as_of`` parameter. Defect D9 fix: no repartition(10000) -- AQE sizes the
shuffle output.

Scale: both are partial+final hash aggregates over (year, month, airline)
/ (fareBasisCode) -- low-cardinality keys with map-side combine, so the
shuffle carries only group states, not rows.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.scalar import davg, dround, dsum


def revenue_by_year_month_airline(
    silver: DataFrame, as_of: dt.date
) -> DataFrame:
    """Gold table 1: single-airline revenue/seats by (year, month, airline).

    Single-airline itineraries: size(array_distinct(airlineCodeArray)) == 1
    (updateToGold.py:31); airline = element_at(.., 1) (updateToGold.py:38);
    flightDate < as_of + 1 day (updateToGold.py:35-37, parameterized).
    """
    return (
        silver.filter(
            F.size(F.array_distinct("airlineCodeArray")) == 1
        )
        .filter(F.col("flightDate") < F.lit(as_of + dt.timedelta(days=1)))
        .select(
            F.year("flightDate").alias("year"),
            F.month("flightDate").alias("month"),
            F.element_at("airlineCodeArray", 1).alias("airline"),
            "totalFare",
            "seatsRemaining",
        )
        .groupBy("year", "month", "airline")
        .agg(
            dsum("totalFare", 2).alias("sum_total_fare"),
            dround(davg("seatsRemaining"), 2).alias("avg_seats_remaining"),
        )
    )


def fare_basis_duration(silver: DataFrame) -> DataFrame:
    """Gold table 2: fareBasisCode -> round(avg travel minutes, 2)
    (updateToGold.py:50-52)."""
    return silver.groupBy("fareBasisCode").agg(
        dround(davg(F.col("travelDuration").cast("double")), 2).alias(
            "avg_travel_duration"
        ),
        F.count(F.lit(1)).alias("n_itineraries"),
    )
