"""Unit tests for functions.scalar (U1/U2 semantics, deterministic sums)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.scalar import (
    davg,
    dsum,
    duration_to_minutes,
    duration_to_minutes_pandas_udf,
    iso_to_timestamp,
)

DURATIONS = [
    ("PT2H29M", 149),
    ("PT2H", 120),
    ("PT55M", 55),
    ("PT0H0M", 0),
    ("PT", 0),
    ("P1DT2H", None),  # unsupported day component -> null (reference regex)
    ("2H29M", None),  # missing PT prefix
    ("garbage", None),
    (None, None),
]


def test_duration_to_minutes_builtin(spark):
    df = spark.createDataFrame(
        [Row(s=s, want=w) for s, w in DURATIONS],
        "s string, want int",
    )
    got = df.select("s", "want", duration_to_minutes("s").alias("got")).collect()
    for r in got:
        assert r.got == r.want, f"{r.s!r}: got {r.got}, want {r.want}"


def test_duration_pandas_udf_agrees_with_builtin(spark):
    df = spark.createDataFrame([Row(s=s) for s, _ in DURATIONS], "s string")
    rows = df.select(
        duration_to_minutes("s").alias("b"),
        duration_to_minutes_pandas_udf("s").alias("u"),
    ).collect()
    assert all(r.b == r.u for r in rows)


def test_iso_to_timestamp_handles_z_and_offsets(spark):
    df = spark.createDataFrame(
        [
            Row(s="2022-04-17T13:30:00Z"),
            Row(s="2022-04-17T09:30:00-04:00"),
            Row(s="2022-04-17 13:30:00"),
            Row(s=None),
        ],
        "s string",
    )
    got = [r.ts for r in df.select(iso_to_timestamp("s").alias("ts")).collect()]
    # session tz is UTC: Z and -04:00 forms are the same instant
    assert got[0] == got[1]
    assert got[0].hour == 13 and got[0].minute == 30
    assert got[2] is not None and got[3] is None


def test_dsum_is_partitioning_independent(spark):
    vals = [(i, round(0.01 * i + 0.005, 3)) for i in range(1, 2000)]
    df = spark.createDataFrame(vals, "id int, v double")
    one = df.coalesce(1).agg(dsum("v", 3).alias("s")).collect()[0].s
    many = df.repartition(16).agg(dsum("v", 3).alias("s")).collect()[0].s
    assert one == many  # bit-exact, not approx

    a1 = df.coalesce(1).agg(F.round(davg("v", 3), 2).alias("a")).collect()[0].a
    a2 = df.repartition(16).agg(F.round(davg("v", 3), 2).alias("a")).collect()[0].a
    assert a1 == a2
