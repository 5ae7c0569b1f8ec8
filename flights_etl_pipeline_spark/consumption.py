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


def render_dashboard_html(
    spark: SparkSession, gold_table: str, k: int = 10
) -> str:
    """Self-contained static dashboard over the gold reads — zero
    dependencies, so unlike :func:`build_dash_app` it runs in ANY
    environment (the reference's Dash container plots a public demo
    CSV, docker/plotly/app.py:5; this renders the actual warehouse).

    One inline-SVG line chart of monthly revenue per airline plus the
    top-k leaderboard table, from the same panel-sized gold reads the
    Dash wiring uses. Everything driver-side is panel-sized: the trend
    frame is (months x airlines) rows and the leaderboard is k rows —
    the lake is never scanned at render time.
    """
    import html as _html

    trend = revenue_trend(spark, gold_table).collect()
    board = top_airlines(spark, gold_table, k=k).collect()

    months = sorted({(r["year"], r["month"]) for r in trend})
    airlines = sorted({r["airline"] for r in trend})
    by_key = {
        (r["airline"], r["year"], r["month"]): float(r["sum_total_fare"])
        for r in trend
    }
    w, h, pad = 640, 280, 40
    vmax = max((float(r["sum_total_fare"]) for r in trend), default=1.0)
    # 10-color tab10 palette, cycled per airline; presentation-only
    colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
              "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf"]

    def _x(i: int) -> float:
        n = max(len(months) - 1, 1)
        return pad + i * (w - 2 * pad) / n

    def _y(v: float) -> float:
        return h - pad - (v / vmax) * (h - 2 * pad) if vmax else h - pad

    paths = []
    for ai, airline in enumerate(airlines):
        pts = [
            (i, by_key.get((airline, ym[0], ym[1])))
            for i, ym in enumerate(months)
        ]
        pts = [(i, v) for i, v in pts if v is not None]
        if not pts:
            continue
        d = " ".join(
            f"{'M' if j == 0 else 'L'}{_x(i):.1f},{_y(v):.1f}"
            for j, (i, v) in enumerate(pts)
        )
        color = colors[ai % len(colors)]
        paths.append(
            f'<path d="{d}" fill="none" stroke="{color}" stroke-width="2"/>'
            f'<text x="{_x(pts[-1][0]) + 4:.1f}" y="{_y(pts[-1][1]):.1f}" '
            f'fill="{color}" font-size="11">'
            f"{_html.escape(airline)}</text>"
        )
    ticks = "".join(
        f'<text x="{_x(i):.1f}" y="{h - pad + 14}" font-size="10" '
        f'text-anchor="middle">{y}-{m:02d}</text>'
        for i, (y, m) in enumerate(months)
    )
    svg = (
        f'<svg viewBox="0 0 {w + 60} {h}" width="{w + 60}" height="{h}" '
        f'xmlns="http://www.w3.org/2000/svg">'
        f'<line x1="{pad}" y1="{h - pad}" x2="{w - pad}" y2="{h - pad}" '
        f'stroke="#999"/>'
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{h - pad}" '
        f'stroke="#999"/>'
        f'<text x="{pad - 6}" y="{pad}" font-size="10" text-anchor="end">'
        f"{vmax:,.0f}</text>"
        + ticks
        + "".join(paths)
        + "</svg>"
    )
    rows = "".join(
        f"<tr><td>{_html.escape(r['airline'])}</td>"
        f"<td style='text-align:right'>{float(r['total_revenue']):,.2f}"
        f"</td></tr>"
        for r in board
    )
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>Revenue dashboard — {_html.escape(gold_table)}</title>"
        "<style>body{font-family:sans-serif;margin:2em}"
        "table{border-collapse:collapse}td,th{border:1px solid #ccc;"
        "padding:4px 10px}</style></head><body>"
        "<h1>Revenue by month</h1>" + svg +
        f"<h2>Top {k} airlines by revenue</h2>"
        "<table><tr><th>airline</th><th>total revenue</th></tr>"
        + rows + "</table></body></html>"
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
