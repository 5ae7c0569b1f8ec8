"""Consumption layer: presentation-ready reads over the gold tables.

The reference ships a Dash dashboard container (docker/plotly/app.py:5-21
-- note it actually plots a public demo CSV, not the warehouse; the
intended wiring is a gold-table read). This module provides that wiring
as plain DataFrame functions a dashboard (or notebook, or BI export)
calls: each returns a small, already-aggregated frame -- the dashboard
never scans the lake, it reads gold output sized for a single panel.

The Dash app itself is optional glue (dash/plotly are not in this
container); :func:`build_dash_app` is gated behind import-try and the
testable surface is the query functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def revenue_trend(
    spark: SparkSession, gold_table: str, airline: str | None = None
) -> DataFrame:
    """Monthly revenue trend (optionally one airline) from the gold
    revenue table -- the line-chart feed (reference app.py:20-22 shape:
    filter by dropdown value, plot metric over time)."""
    df = spark.table(gold_table)
    if airline is not None:
        df = df.filter(F.col("airline") == airline)
    return df.select(
        "year", "month", "airline", "sum_total_fare"
    ).orderBy("year", "month", "airline")


def airline_options(spark: SparkSession, gold_table: str) -> list[str]:
    """Dropdown option list (the one sanctioned driver-side collect of a
    panel-sized distinct)."""
    rows = (
        spark.table(gold_table).select("airline").distinct().orderBy("airline")
    ).collect()
    return [r["airline"] for r in rows]


def top_airlines(
    spark: SparkSession, gold_table: str, k: int = 10
) -> DataFrame:
    """Leaderboard panel: top-k airlines by total revenue."""
    return (
        spark.table(gold_table)
        .groupBy("airline")
        .agg(F.sum("sum_total_fare").alias("total_revenue"))
        .orderBy(F.col("total_revenue").desc(), "airline")
        .limit(k)
    )


def build_dash_app(spark: SparkSession, gold_table: str):
    """Optional Dash app over the gold reads (reference docker/plotly).

    Import-gated: dash/plotly are deployment-container dependencies, not
    engine dependencies. Raises ImportError where they are absent.
    """
    from dash import Dash, Input, Output, callback, dcc, html  # noqa: F401
    import plotly.express as px  # noqa: F401

    app = Dash()
    options = airline_options(spark, gold_table)
    app.layout = [
        html.H1(children="Revenue by month"),
        dcc.Dropdown(options, options[0] if options else None, id="airline"),
        dcc.Graph(id="trend"),
    ]

    @callback(Output("trend", "figure"), Input("airline", "value"))
    def update(airline):  # pragma: no cover - needs a browser session
        pdf = revenue_trend(spark, gold_table, airline).toPandas()
        pdf["ym"] = pdf["year"].astype(str) + "-" + pdf["month"].astype(str)
        return px.line(pdf, x="ym", y="sum_total_fare")

    return app
