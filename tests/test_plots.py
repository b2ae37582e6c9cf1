"""Chart-layer tests: every reference figure is written as a valid
SVG with the expected series, labels, and annotations from a golden
fixture (reference: reporting/monthly_report.py:96-512,
reporting/cumulative_report.py:294-460)."""

from __future__ import annotations

import datetime as dt
import xml.etree.ElementTree as ET

import pytest

from pos_api_pipeline_spark.operators.cleaning import clean_for_reporting
from pos_api_pipeline_spark.operators.combos import explode_combo_items
from pos_api_pipeline_spark.plans import plots

COMBO_MODS = (
    "Hamburguesa 1(Hamburguesa Smash 1);Hamburguesa 2(Hamburguesa Chiken 2);"
    "Mayonesa(Ajo);Mayonesa(Chipotle);Refresco Sabor(Agua Natural)"
)


@pytest.fixture(scope="module")
def cleaned(spark):
    def row(receipt, ts, order, item, mods, price=50.0):
        return (
            receipt, ts, order, item, "10.0", str(price), str(price), mods, ts
        )

    jul = dt.datetime(2025, 7, 21, 13, 0)
    aug = dt.datetime(2025, 8, 2, 19, 30)
    rows = [
        row("r1", jul, "Mesa 2", "Smash Burger", "Mayonesa(Ajo)"),
        row("r2", jul, "A domicilio", "Smash Burger",
            "Mayonesa(Sin mayonesa)"),
        row("r2", jul, "A domicilio", "Refresco Coca", None),
        row("r3", jul + dt.timedelta(days=1), "Para Llevar",
            "Malteada Chocolate", None),
        row("r4", jul + dt.timedelta(days=1), "Mesa 1", "Agua natural", None),
        row("r5", aug, "Mesa 3", "Doble Burger", "Mayonesa(Chipotle)"),
        row("r6", aug, "A domicilio", "Refresco Squirt", None),
        row("r7", aug, "Mesa 1", "Combo Pa' Dos", COMBO_MODS, 240.0),
    ]
    df = spark.createDataFrame(
        rows,
        "receipt_number string, datetime timestamp, order_type string,"
        "item_name string, cost string, price string, total_money string,"
        "modifiers string, shifted_time timestamp",
    )
    return clean_for_reporting(df).cache()


def _svg(path):
    text = path.read_text()
    ET.fromstring(text)  # raises on malformed XML
    return text


def test_generate_all_report_figures(cleaned, tmp_path):
    out = plots.generate_all_report_figures(
        cleaned, explode_combo_items(cleaned), tmp_path
    )
    assert len(out) == 13  # 12 fixed figures + 1 combo in the fixture
    names = {p.name for p in out}
    expected = {
        "monthly_mayo_preference_comparison.svg",
        "monthly_beverage_comparison.svg",
        "top_5_products.svg",
        "beverage_distribution.svg",
        "mayonnaise_stacked_counts.svg",
        "sales_by_weekday.svg",
        "daily_sales_trends.svg",
        "daily_sales_comparison.svg",
        "monthly_comparison_by_weekday.svg",
        "weekday_vs_weekend_performance.svg",
        "hourly_sales_heatmap.svg",
        "monthly_sales_trend.svg",
        "combo_analysis_combo_pa_dos.svg",
    }
    assert names == expected
    for p in out:
        assert p.stat().st_size > 500
        _svg(p)  # well-formed XML


def test_mayo_comparison_panels_and_series(cleaned, tmp_path):
    p = plots.plot_monthly_mayo_comparison(cleaned, tmp_path)
    svg = _svg(p)
    # One facet per month, like catplot(col='month').
    assert "Month: 2025-07" in svg and "Month: 2025-08" in svg
    # 'Sin mayonesa' standardized to Natural (C6).
    assert 'data-series="Natural"' in svg
    assert 'data-series="Chipotle"' in svg
    assert 'data-category="Smash Burger"' in svg


def test_stacked_mayo_percent_labels(cleaned, tmp_path):
    p = plots.plot_stacked_counts_with_percentage_labels(cleaned, tmp_path)
    svg = _svg(p)
    # Smash Burger July: 1×Ajo + 1×Natural → 50.0% each.
    assert svg.count("50.0%") == 2
    assert "Mayonnaise Preference per Burger Type" in svg


def test_top_products_value_labels(cleaned, tmp_path):
    p = plots.create_top_products_plot(explode_combo_items(cleaned), tmp_path)
    svg = _svg(p)
    # Post-explode: Smash Burger = 2 originals + 1 combo-exploded = 3.
    assert 'data-category="Smash Burger" data-value="3"' in svg
    assert "Top 5 Most Sold Items This Month" in svg


def test_beverage_distribution_categories(cleaned, tmp_path):
    p = plots.plot_beverage_distribution(cleaned, tmp_path)
    svg = _svg(p)
    for cat in ("Aguas", "Malteadas", "Refrescos"):
        assert f'data-category="{cat}"' in svg
    assert "100%" in svg  # single-item categories are labeled 100%


def test_weekday_lines_cover_all_days(cleaned, tmp_path):
    p = plots.plot_sales_by_day_of_week(cleaned, tmp_path)
    svg = _svg(p)
    assert 'data-series="Total Sales"' in svg
    for day in ("Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
                "Saturday", "Sunday"):
        assert day in svg  # observed=False semantics: all 7 days on axis
    assert 'data-series="Restaurante"' in svg


def test_daily_trends_annotations(cleaned, tmp_path):
    p = plots.plot_daily_sales_trends(cleaned, tmp_path)
    svg = _svg(p)
    assert "Avg. Ticket Value: $" in svg
    assert svg.count('class="annotation"') == 3  # 3 distinct dates


def test_heatmap_cells(cleaned, tmp_path):
    p = plots.plot_hourly_sales_heatmap(cleaned, tmp_path)
    svg = _svg(p)
    # July 21 was a Monday, 13:00 — r1 and r2 → 2 unique receipts.
    assert 'data-row="Monday" data-col="13" data-value="2"' in svg
    assert "Hourly Customer Traffic by Day of the Week" in svg


def test_weekday_weekend_three_panels(cleaned, tmp_path):
    p = plots.plot_weekday_vs_weekend_comparison(cleaned, tmp_path)
    svg = _svg(p)
    for title in ("Total Revenue", "Total Customer Traffic",
                  "Average Spend per Customer"):
        assert title in svg
    assert 'data-category="Weekday"' in svg
    assert 'data-category="Weekend"' in svg


def test_combo_analysis_panels(cleaned, tmp_path):
    paths = plots.plot_combo_analysis_with_mayo(cleaned, tmp_path)
    assert [p.name for p in paths] == ["combo_analysis_combo_pa_dos.svg"]
    svg = _svg(paths[0])
    assert "Analysis for &#x27;Combo Pa&#x27; Dos&#x27;" in svg
    assert "Popularity of Main Items" in svg
    assert "Mayonnaise Preference per Burger" in svg
    # Positional pairing: Ajo→Smash Burger, Chipotle→Chicken Burger.
    assert 'data-series="Ajo" data-category="Smash Burger" data-value="1"' in svg
    assert (
        'data-series="Chipotle" data-category="Chicken Burger" data-value="1"'
        in svg
    )
