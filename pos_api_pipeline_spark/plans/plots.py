"""The reference's 13 report figures, re-expressed Spark-first
(S17 presentation layer).

Each function mirrors one plotting function of the reference
(reporting/monthly_report.py:96-512, reporting/cumulative_report.py:
294-460): same data preparation semantics, same figure composition,
same output file name (``.svg`` — this runtime has no PNG encoder;
see plans/charts.py). The split of work is the important part:

- data prep is a Spark aggregation (the oracled operators from
  operators/ and the classifier Columns), reduced to a few dozen rows;
- ``.collect()`` happens ONLY on that aggregate — the presentation
  boundary, exactly like ``df_to_markdown`` in plans/report.py;
- rendering is driver-side SVG with zero third-party deps.

Every function takes the cleaned curated frame (clean_for_reporting
output) unless noted, and returns the written Path(s).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.analytics import top_k
from pos_api_pipeline_spark.operators.classifiers import (
    beverage_category,
    order_category,
    period_type,
    standardize_beverage_name,
    standardize_mayo,
)
from pos_api_pipeline_spark.operators.cleaning import WEEKDAY_ORDER
from pos_api_pipeline_spark.operators.combos import (
    analyze_combo_choices_with_mayo,
    combo_main_choice_counts,
)
from pos_api_pipeline_spark.plans.charts import (
    BarPanel,
    HeatmapPanel,
    LinePanel,
    render_figure,
)

_BEVERAGE_RX = "(?i)refresco|malteada|coca|squirt|agua|manzanita"
_BURGER_RX = "(?i)burger|smash"
_BEV_CATEGORY_ORDER = ["Aguas", "Malteadas", "Refrescos"]


# ---------------------------------------------------------------------------
# Shared Spark preps (tiny aggregates; collect at the end only).
# Public: they double as registry queries (pos_mayo_distribution etc.)
# so the data behind every figure sits under the DuckDB oracle gate.
# ---------------------------------------------------------------------------


def _sum_dec(col, alias: str):
    """Deterministic monetary sum: exact decimal accumulation, double
    out — sums are order-exact, so figures and oracles agree to the
    cent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(18,2)")).cast("double").alias(alias)


def _with_month(df: DataFrame, ts: str = "shifted_time") -> DataFrame:
    return df.withColumn("month", F.date_format(ts, "yyyy-MM"))


def mayo_distribution(df: DataFrame, by_month: bool) -> DataFrame:
    """calculate_mayo_distribution_by_month /
    calculate_mayo_percentages_and_counts
    (reference: reporting/data_preparation.py:201-268): burgers with a
    Mayonesa modifier, mayo type extracted from ``Mayonesa(...)``,
    'sin mayonesa' standardized to Natural."""
    burgers = df.filter(F.col("item_name").rlike(_BURGER_RX)).filter(
        F.lower(F.col("modifiers")).contains("mayonesa")
    )
    typed = burgers.withColumn(
        "mayo_type",
        standardize_mayo(F.regexp_extract("modifiers", r"Mayonesa\((.*?)\)", 1)),
    ).filter(F.col("mayo_type") != "")  # pandas drops the no-match NaN key
    keys = (["month"] if by_month else []) + ["item_name", "mayo_type"]
    typed = _with_month(typed) if by_month else typed
    return typed.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))


def beverage_distribution(
    df: DataFrame, by_month: bool, standardize: bool
) -> DataFrame:
    """calculate_beverage_distribution(_by_month)
    (reference: reporting/data_preparation.py:272-335)."""
    bev = df.filter(F.col("item_name").rlike(_BEVERAGE_RX))
    if standardize:  # only the by-month variant standardizes water names
        bev = bev.withColumn("item_name", standardize_beverage_name("item_name"))
    bev = bev.withColumn("category", beverage_category("item_name"))
    keys = (["month"] if by_month else []) + ["category", "item_name"]
    bev = _with_month(bev) if by_month else bev
    return bev.groupBy(*keys).agg(F.count(F.lit(1)).alias("count"))


def daily_metrics(df: DataFrame) -> DataFrame:
    """calculate_daily_sales_metrics (reference:
    data_preparation.py:379-398): per-day decimal-exact sales total +
    unique receipts."""
    return df.groupBy(F.to_date("shifted_time").alias("date")).agg(
        _sum_dec("price", "total_sales"),
        F.countDistinct("receipt_number").alias("unique_receipts"),
    )


def weekday_weekend_performance(df: DataFrame) -> DataFrame:
    """calculate_weekday_vs_weekend_performance (reference:
    cumulative_report.py:363-380; weekend = Fri+Sat+Sun)."""
    return (
        df.withColumn("period_type", period_type("datetime"))
        .groupBy("period_type")
        .agg(
            _sum_dec("total_money", "total_revenue"),
            F.countDistinct("receipt_number").alias("total_receipts"),
        )
        .withColumn(
            "avg_sale_per_receipt",
            F.col("total_revenue") / F.col("total_receipts"),
        )
    )


def _pivot_rows(rows, row_key, col_key, val_key):
    """(rows, sorted row labels, sorted col labels, matrix[col][row])
    — the driver-side twin of the reference's pandas .pivot calls."""
    # Row[...] indexing, not getattr: a val_key of 'count' would
    # resolve to Row.count (the method) via getattr.
    row_labels = sorted({r[row_key] for r in rows})
    col_labels = sorted({r[col_key] for r in rows})
    cells = {(r[row_key], r[col_key]): r[val_key] for r in rows}
    matrix = [
        [float(cells.get((rl, cl), 0.0)) for rl in row_labels]
        for cl in col_labels
    ]
    return row_labels, col_labels, matrix


# ---------------------------------------------------------------------------
# Monthly report figures (reference: reporting/monthly_report.py)
# ---------------------------------------------------------------------------


def plot_monthly_mayo_comparison(df: DataFrame, output_dir) -> Path:
    """Grouped bars of mayo preference per burger, one panel per month
    (reference: monthly_report.py:96-132, seaborn catplot col='month')."""
    rows = mayo_distribution(df, by_month=True).collect()
    months = sorted({r.month for r in rows})
    panels = []
    for m in months:
        sub = [r for r in rows if r.month == m]
        cats, series_labels, matrix = _pivot_rows(
            sub, "item_name", "mayo_type", "count"
        )
        panels.append(
            BarPanel(
                categories=cats,
                series=list(zip(series_labels, matrix)),
                title=f"Month: {m}",
                xlabel="Burger Type",
                ylabel="Number of Items Sold",
            )
        )
    return render_figure(
        Path(output_dir) / "monthly_mayo_preference_comparison.svg",
        panels,
        suptitle="Monthly Comparison of Mayonnaise Preference per Burger",
    )


def plot_monthly_beverage_comparison(df: DataFrame, output_dir) -> Path:
    """Faceted beverage bars per month with the fixed category order
    that aligns facets (reference: monthly_report.py:134-177)."""
    rows = beverage_distribution(df, by_month=True, standardize=True).collect()
    months = sorted({r.month for r in rows})
    panels = []
    for m in months:
        sub = [r for r in rows if r.month == m]
        _, series_labels, _ = _pivot_rows(sub, "category", "item_name", "count")
        cells = {(r.category, r.item_name): r["count"] for r in sub}
        matrix = [
            [float(cells.get((c, s), 0.0)) for c in _BEV_CATEGORY_ORDER]
            for s in series_labels
        ]
        panels.append(
            BarPanel(
                categories=_BEV_CATEGORY_ORDER,
                series=list(zip(series_labels, matrix)),
                title=f"Month: {m}",
                xlabel="Beverage Category",
                ylabel="Number of Items Sold",
            )
        )
    return render_figure(
        Path(output_dir) / "monthly_beverage_comparison.svg",
        panels,
        suptitle="Monthly Comparison of Beverage Sales",
    )


def create_top_products_plot(exploded_df: DataFrame, output_dir) -> Path:
    """Top-5 items bar chart with count labels on the bars
    (reference: monthly_report.py:179-221; input is the exploded
    frame, like the reference's post-explode df)."""
    rows = top_k(exploded_df, "item_name", k=5).collect()
    names = [r.item_name for r in rows]
    counts = [float(r["count"]) for r in rows]
    panel = BarPanel(
        categories=names,
        series=[("items_sold", counts)],
        title="Top 5 Most Sold Items This Month",
        xlabel="Product",
        ylabel="Number of Items Sold",
        labels=[[f"{int(c)}" for c in counts]],
    )
    return render_figure(Path(output_dir) / "top_5_products.svg", [panel])


def plot_beverage_distribution(df: DataFrame, output_dir) -> Path:
    """Stacked beverage bars with in-bar percentage labels (> 5% only,
    as the reference) (reference: monthly_report.py:226-297)."""
    rows = beverage_distribution(df, by_month=False, standardize=False).collect()
    cats, series_labels, matrix = _pivot_rows(
        rows, "category", "item_name", "count"
    )
    totals = [sum(col[c] for col in matrix) for c in range(len(cats))]
    labels = [
        [
            f"{100 * col[c] / totals[c]:.0f}%"
            if totals[c] and 100 * col[c] / totals[c] > 5
            else ""
            for c in range(len(cats))
        ]
        for col in matrix
    ]
    panel = BarPanel(
        categories=cats,
        series=list(zip(series_labels, matrix)),
        title="Beverage Sales Distribution",
        xlabel="Beverage Category",
        ylabel="Number of Items Sold",
        stacked=True,
        labels=labels,
    )
    return render_figure(Path(output_dir) / "beverage_distribution.svg", [panel])


def plot_stacked_counts_with_percentage_labels(
    df: DataFrame, output_dir
) -> Path:
    """Stacked mayo-per-burger bars, percentage labels with one
    decimal (reference: monthly_report.py:300-336)."""
    rows = mayo_distribution(df, by_month=False).collect()
    cats, series_labels, matrix = _pivot_rows(
        rows, "item_name", "mayo_type", "count"
    )
    totals = [sum(col[c] for col in matrix) for c in range(len(cats))]
    labels = [
        [
            f"{100 * col[c] / totals[c]:.1f}%" if totals[c] and col[c] else ""
            for c in range(len(cats))
        ]
        for col in matrix
    ]
    panel = BarPanel(
        categories=cats,
        series=list(zip(series_labels, matrix)),
        title="Mayonnaise Preference per Burger Type",
        xlabel="Burger Type",
        ylabel="Number of Burgers Sold",
        stacked=True,
        labels=labels,
    )
    return render_figure(
        Path(output_dir) / "mayonnaise_stacked_counts.svg", [panel]
    )


def weekday_traffic(df: DataFrame) -> DataFrame:
    """calculate_sales_by_day_of_week (reference:
    data_preparation.py:338-377): unique receipts per weekday ×
    order category."""
    return (
        df.withColumn("order_category", order_category("order_type"))
        .groupBy("day_of_week", "order_category")
        .agg(F.countDistinct("receipt_number").alias("count"))
    )


def plot_sales_by_day_of_week(df: DataFrame, output_dir) -> Path:
    """Weekday traffic lines: dashed black total + one line per order
    category, all 7 days present even when empty (the reference's
    ordered categorical with observed=False)
    (reference: monthly_report.py:338-374)."""
    rows = weekday_traffic(df).collect()
    cats = sorted({r.order_category for r in rows})
    cells = {(r.day_of_week, r.order_category): r["count"] for r in rows}
    series = [
        (
            "Total Sales",
            [
                float(sum(cells.get((d, c), 0) for c in cats))
                for d in WEEKDAY_ORDER
            ],
            "dashed",
        )
    ]
    series += [
        (c, [float(cells.get((d, c), 0)) for d in WEEKDAY_ORDER], "solid")
        for c in cats
    ]
    panel = LinePanel(
        x_labels=WEEKDAY_ORDER,
        series=series,
        title="Sales Traffic by Day of the Week",
        xlabel="Day of the Week",
        ylabel="Number of Unique Receipts",
    )
    return render_figure(Path(output_dir) / "sales_by_weekday.svg", [panel])


def plot_daily_sales_trends(df: DataFrame, output_dir) -> Path:
    """Daily receipts line with $sales annotations per point and the
    month's average ticket value in a corner note
    (reference: monthly_report.py:376-420)."""
    rows = daily_metrics(df).orderBy("date").collect()
    dates = [str(r.date) for r in rows]
    receipts = [float(r.unique_receipts) for r in rows]
    total_sales = sum(r.total_sales for r in rows)
    total_receipts = sum(r.unique_receipts for r in rows)
    avg_ticket = total_sales / total_receipts if total_receipts else 0.0
    panel = LinePanel(
        x_labels=dates,
        series=[("Unique Receipts", receipts, "solid")],
        title="Daily Customer Traffic and Sales",
        xlabel="Date",
        ylabel="Number of Unique Receipts",
        annotations=[
            (i, receipts[i], f"${rows[i].total_sales:,.0f}")
            for i in range(len(rows))
        ],
        note=f"Avg. Ticket Value: ${avg_ticket:,.2f}",
    )
    return render_figure(Path(output_dir) / "daily_sales_trends.svg", [panel])


def plot_daily_sales_comparison(df: DataFrame, output_dir) -> Path:
    """Month-over-month daily traffic lines on a day-of-month axis
    (reference: monthly_report.py:424-461)."""
    rows = (
        _with_month(df)
        .withColumn("day_of_month", F.dayofmonth("shifted_time"))
        .groupBy("month", "day_of_month")
        .agg(F.countDistinct("receipt_number").alias("unique_receipts"))
        .collect()
    )
    months = sorted({r.month for r in rows})
    days = sorted({r.day_of_month for r in rows})
    cells = {(r.month, r.day_of_month): r.unique_receipts for r in rows}
    series = [
        (m, [float(cells.get((m, d), 0)) for d in days], "solid")
        for m in months
    ]
    panel = LinePanel(
        x_labels=days,
        series=series,
        title="Daily Customer Traffic: Month-over-Month Comparison",
        xlabel="Day of the Month",
        ylabel="Number of Unique Receipts",
    )
    return render_figure(
        Path(output_dir) / "daily_sales_comparison.svg", [panel]
    )


def plot_monthly_comparison_by_weekday(df: DataFrame, output_dir) -> Path:
    """Weekday traffic lines, one series per (month, order category),
    'Otro' filtered out as in the reference; months distinguish by
    color, categories by dash style
    (reference: monthly_report.py:464-509)."""
    rows = (
        _with_month(df)
        .withColumn("order_category", order_category("order_type"))
        .filter(F.col("order_category") != "Otro")
        .groupBy("month", "day_of_week", "order_category")
        .agg(F.countDistinct("receipt_number").alias("count"))
        .collect()
    )
    months = sorted({r.month for r in rows})
    cats = sorted({r.order_category for r in rows})
    cells = {(r.month, r.day_of_week, r.order_category): r["count"] for r in rows}
    series = []
    for m in months:
        for ci, c in enumerate(cats):
            series.append(
                (
                    f"{m} — {c}",
                    [float(cells.get((m, d, c), 0)) for d in WEEKDAY_ORDER],
                    "solid" if ci == 0 else "dashed",
                )
            )
    panel = LinePanel(
        x_labels=WEEKDAY_ORDER,
        series=series,
        title="Monthly Comparison of Sales Traffic by Day",
        xlabel="Day of the Week",
        ylabel="Number of Unique Receipts",
    )
    return render_figure(
        Path(output_dir) / "monthly_comparison_by_weekday.svg", [panel]
    )


# ---------------------------------------------------------------------------
# Cumulative report figures (reference: reporting/cumulative_report.py)
# ---------------------------------------------------------------------------


def plot_combo_analysis_with_mayo(df: DataFrame, output_dir) -> list[Path]:
    """Per-combo two-panel figure: popularity of main items + mayo
    preference per burger (reference: cumulative_report.py:294-359).
    Returns one path per combo found."""
    import re

    mains = combo_main_choice_counts(df).collect()
    mayo = analyze_combo_choices_with_mayo(df).collect()
    paths = []
    for combo in sorted({r.item_name for r in mains}):
        main_rows = sorted(
            (r for r in mains if r.item_name == combo),
            key=lambda r: (-r.n, r.choice),
        )
        panels = [
            BarPanel(
                categories=[r.choice for r in main_rows],
                series=[("Count", [float(r.n) for r in main_rows])],
                title="Popularity of Main Items",
                xlabel="Item Choice",
                ylabel="Number of Times Chosen",
                labels=[[str(r.n) for r in main_rows]],
            )
        ]
        sub = [r for r in mayo if r.item_name == combo]
        if sub:
            burgers, mayos, matrix = _pivot_rows(sub, "burger", "mayo_type", "n")
            panels.append(
                BarPanel(
                    categories=burgers,
                    series=list(zip(mayos, matrix)),
                    title="Mayonnaise Preference per Burger",
                    xlabel="Burger Choice",
                    ylabel="Count",
                )
            )
        safe = re.sub(r"[^a-zA-Z0-9_]", "", combo.replace(" ", "_")).lower()
        paths.append(
            render_figure(
                Path(output_dir) / f"combo_analysis_{safe}.svg",
                panels,
                suptitle=f"Analysis for '{combo}'",
            )
        )
    return paths


def plot_weekday_vs_weekend_comparison(df: DataFrame, output_dir) -> Path:
    """Three-panel bars: revenue, traffic, average spend per customer
    for weekday vs weekend (reference: cumulative_report.py:363-419;
    weekend = Fri+Sat+Sun, the reference's deliberate rule)."""
    rows = weekday_weekend_performance(df).orderBy("period_type").collect()
    cats = [r.period_type for r in rows]
    panels = [
        BarPanel(
            categories=cats,
            series=[("total_revenue", [float(r.total_revenue) for r in rows])],
            title="Total Revenue",
            ylabel="Total Sales ($)",
            labels=[[f"${r.total_revenue:,.0f}" for r in rows]],
        ),
        BarPanel(
            categories=cats,
            series=[
                ("total_receipts", [float(r.total_receipts) for r in rows])
            ],
            title="Total Customer Traffic",
            xlabel="Period",
            ylabel="Number of Unique Receipts",
        ),
        BarPanel(
            categories=cats,
            series=[
                (
                    "avg_sale_per_receipt",
                    [float(r.avg_sale_per_receipt) for r in rows],
                )
            ],
            title="Average Spend per Customer",
            ylabel="Average Sale Value ($)",
            labels=[[f"${r.avg_sale_per_receipt:,.2f}" for r in rows]],
        ),
    ]
    return render_figure(
        Path(output_dir) / "weekday_vs_weekend_performance.svg",
        panels,
        suptitle="Weekday vs. Weekend Performance Comparison",
    )


def plot_hourly_sales_heatmap(df: DataFrame, output_dir) -> Path:
    """Day-of-week × hour heatmap of unique receipts, annotated per
    cell (reference: cumulative_report.py:423-460)."""
    rows = (
        df.groupBy("day_of_week", "hour_of_day")
        .agg(F.countDistinct("receipt_number").alias("n"))
        .collect()
    )
    cells = {(r.day_of_week, r.hour_of_day): float(r.n) for r in rows}
    hours = list(range(24))
    values = [
        [cells.get((d, h), 0.0) for h in hours] for d in WEEKDAY_ORDER
    ]
    panel = HeatmapPanel(
        row_labels=WEEKDAY_ORDER,
        col_labels=hours,
        values=values,
        title="Hourly Customer Traffic by Day of the Week",
        xlabel="Hour of the Day",
        ylabel="Day of the Week",
    )
    return render_figure(
        Path(output_dir) / "hourly_sales_heatmap.svg", [panel]
    )


def plot_monthly_sales_trend(df: DataFrame, output_dir) -> Path:
    """Per-month total sales bars (reference:
    cumulative_report.py:462-520: to_numeric coercion + strftime
    month grouping — clean_for_reporting already did the coercion)."""
    rows = (
        _with_month(df)
        .groupBy("month")
        .agg(F.sum("total_money").alias("total_sales"))
        .orderBy("month")
        .collect()
    )
    panel = BarPanel(
        categories=[r.month for r in rows],
        series=[("total_sales", [float(r.total_sales) for r in rows])],
        title="Total Sales per Month",
        xlabel="Month",
        ylabel="Total Sales ($)",
        labels=[[f"${r.total_sales:,.0f}" for r in rows]],
    )
    return render_figure(
        Path(output_dir) / "monthly_sales_trend.svg", [panel]
    )


def generate_all_report_figures(
    cleaned: DataFrame, exploded: DataFrame, output_dir
) -> list[Path]:
    """Every figure of both reference reports in one call — the plot
    half of generate_monthly_report + generate_cumulative_report."""
    out = [
        plot_monthly_mayo_comparison(cleaned, output_dir),
        plot_monthly_beverage_comparison(cleaned, output_dir),
        create_top_products_plot(exploded, output_dir),
        plot_beverage_distribution(cleaned, output_dir),
        plot_stacked_counts_with_percentage_labels(cleaned, output_dir),
        plot_sales_by_day_of_week(cleaned, output_dir),
        plot_daily_sales_trends(cleaned, output_dir),
        plot_daily_sales_comparison(cleaned, output_dir),
        plot_monthly_comparison_by_weekday(cleaned, output_dir),
        plot_weekday_vs_weekend_comparison(cleaned, output_dir),
        plot_hourly_sales_heatmap(cleaned, output_dir),
        plot_monthly_sales_trend(cleaned, output_dir),
    ]
    out += plot_combo_analysis_with_mayo(cleaned, output_dir)
    return out
