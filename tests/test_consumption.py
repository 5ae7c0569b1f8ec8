"""Consumption layer: gold-table reads a dashboard would issue
(reference docker/plotly/app.py, rebuilt as tested DataFrame functions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark import consumption


@pytest.fixture()
def gold_table(spark, tmp_path):
    name = "gold_rev_test"
    (
        spark.createDataFrame(
            [
                (2024, 1, "AA", 100.0, 3.5),
                (2024, 2, "AA", 150.0, 2.0),
                (2024, 1, "UA", 300.0, 1.0),
                (2024, 2, "UA", 50.0, 4.0),
                (2024, 1, "DL", 10.0, 9.0),
            ],
            "year INT, month INT, airline STRING, "
            "sum_total_fare DOUBLE, avg_seats_remaining DOUBLE",
        ).createOrReplaceTempView(name)
    )
    return name


def test_revenue_trend_filters_and_orders(spark, gold_table):
    rows = consumption.revenue_trend(spark, gold_table, "AA").collect()
    assert [(r.year, r.month, r.sum_total_fare) for r in rows] == [
        (2024, 1, 100.0),
        (2024, 2, 150.0),
    ]
    assert len(consumption.revenue_trend(spark, gold_table).collect()) == 5


def test_airline_options_sorted(spark, gold_table):
    assert consumption.airline_options(spark, gold_table) == ["AA", "DL", "UA"]


def test_top_airlines_leaderboard(spark, gold_table):
    rows = consumption.top_airlines(spark, gold_table, k=2).collect()
    assert [(r.airline, r.total_revenue) for r in rows] == [
        ("UA", 350.0),
        ("AA", 250.0),
    ]


def test_dash_app_gated_on_import(spark, gold_table):
    try:
        import dash  # noqa: F401

        have_dash = True
    except ImportError:
        have_dash = False
    if have_dash:
        app = consumption.build_dash_app(spark, gold_table)
        assert app is not None
    else:
        with pytest.raises(ImportError):
            consumption.build_dash_app(spark, gold_table)


def test_render_dashboard_html_self_contained(spark, gold_table):
    """The no-dependency renderer must emit a complete document with
    one SVG path per airline that has data, month tick labels, and the
    leaderboard ordered like top_airlines."""
    html = consumption.render_dashboard_html(spark, gold_table, k=2)
    assert html.startswith("<!doctype html>") and html.endswith("</html>")
    assert html.count("<path ") == 3  # AA, UA, DL all have trend points
    for tick in ("2024-01", "2024-02"):
        assert tick in html
    # leaderboard: UA (350) above AA (250), DL cut by k=2
    ua = html.index("<td>UA</td>")
    aa = html.index("<td>AA</td>")
    assert ua < aa
    assert "<td>DL</td>" not in html
    assert "350.00" in html and "250.00" in html
    # no external fetches: self-contained means offline-renderable
    assert "http" not in html.split("xmlns")[0]
    assert "src=" not in html and "href=" not in html
