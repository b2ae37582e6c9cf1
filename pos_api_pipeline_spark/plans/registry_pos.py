"""Registry batch 3: the POS curation surface under the oracle gate.

The driver's testdata has no nested-receipt table, so these queries
BUILD one deterministically from orders+lineitem (collect_list of
structs), push it through the real curation operators (flatten P1,
homogenize C1, time enrichment T2/T4/T5, combo explode U1), and
aggregate. The DuckDB twin computes the same result directly from the
flat tables — if flatten/homogenize/explode mangled anything, counts,
names, modifiers, or sums diverge and the hash catches it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.combos import explode_combo_items
from pos_api_pipeline_spark.operators.transform import run_transform
from pos_api_pipeline_spark.plans.registry import _sum_dec, _t, register

# Deterministic free-text order types exercising every homogenize rule
# (etl/transform.py:101-123): '01'-hit, '-'-hit, 'domicilio'-hit,
# 'Llevar'-hit, and a passthrough.
_ORDER_TYPES = ["Mesa 2", "A domicilio 01", "Para Llevar", "algo-x", "mostrador"]
# What the sequential-mask homogenizer turns each into:
_HOMOGENIZED = ["Mesa 2", "Para llevar", "Para llevar", "Mesa 2", "mostrador"]


def _synth_receipts(spark, sf_dir):
    """Nested receipts: one per order, line_items collected from
    lineitem, order type keyed on o_orderkey % 5."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct(
                F.concat(F.lit("P"), F.col("l_partkey").cast("string")).alias(
                    "item_name"
                ),
                (F.col("l_extendedprice") * 0.6).alias("cost"),
                F.col("l_extendedprice").alias("price"),
                F.col("l_extendedprice").alias("total_money"),
                F.array(
                    F.struct(
                        F.lit("Mayonesa").alias("name"), F.lit("Ajo").alias("option")
                    )
                ).alias("line_modifiers"),
            )
        ).alias("line_items")
    )
    order_arr = F.array(*[F.lit(x) for x in _ORDER_TYPES])
    iso = F.concat(
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss"), F.lit(".000Z")
    )
    return (
        o.join(lines, o.o_orderkey == lines.l_orderkey)
        .select(
            F.col("o_orderkey").cast("string").alias("receipt_number"),
            iso.alias("receipt_date"),
            iso.alias("created_at"),
            iso.alias("updated_at"),
            F.element_at(
                order_arr, (F.pmod("o_orderkey", F.lit(5)) + 1).cast("int")
            ).alias("order"),
            F.array(F.struct(F.lit("CASH").alias("type"))).alias("payments"),
            "line_items",
        )
    )


@register(
    "pos_curation_roundtrip",
    f"""
    WITH m AS (
      SELECT o_orderkey,
             CASE o_orderkey % 5
               {' '.join(f"WHEN {i} THEN '{h}'" for i, h in enumerate(_HOMOGENIZED))}
             END AS order_type,
             printf('%02d:00-%02d:00',
                    hour(o_orderdate - INTERVAL 6 HOUR),
                    hour(o_orderdate - INTERVAL 6 HOUR) + 1) AS time_slot,
             strftime(o_orderdate, '%Y-%m-%d') AS sale_date
      FROM orders
    )
    SELECT order_type, time_slot,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS n_receipts,
           (CAST(SUM(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 100.0)
             AS revenue
    FROM lineitem l JOIN m ON l.l_orderkey = m.o_orderkey
    GROUP BY 1, 2
    """,
)
def q_pos_curation_roundtrip(spark, sf_dir):
    """Flatten + homogenize + time-slot the synthesized receipts via
    the REAL run_transform chain, then aggregate per (order_type,
    time_slot). Line counts prove the explode multiplicity; order_type
    values prove the homogenize CASE; time_slot proves the −6 h shift
    + hourly bucketing; revenue proves per-line metadata carriage."""
    receipts = _synth_receipts(spark, sf_dir)
    curated = run_transform(receipts)
    return curated.groupBy("order_type", "time_slot").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("receipt_number").alias("n_receipts"),
        _sum_dec("price", "revenue"),
    )


_COMBO_MODS = (
    "Hamburguesa 1(Hamburguesa Smash 1);Hamburguesa 2(Hamburguesa Chiken 2);"
    "Mayonesa(Ajo);Mayonesa(Chipotle);Refresco Sabor(Agua Natural)"
)


@register(
    "pos_combo_explode",
    f"""
    WITH combos AS (
      SELECT count(*) AS n FROM lineitem WHERE l_linenumber = 1
    ), exploded AS (
      SELECT 'Smash Burger' AS item_name, 'Mayonesa(Ajo)' AS modifiers,
             n, CAST(0.0 AS DOUBLE) AS revenue FROM combos
      UNION ALL
      SELECT 'Chicken Burger', 'Mayonesa(Chipotle)', n, CAST(0.0 AS DOUBLE)
      FROM combos
      UNION ALL
      SELECT 'Agua Natural', NULL, n, CAST(0.0 AS DOUBLE) FROM combos
      UNION ALL
      SELECT 'P' || CAST(l_partkey AS VARCHAR), 'Mayonesa(Ajo)',
             CAST(count(*) AS BIGINT),
             (CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 100.0)
      FROM lineitem WHERE l_linenumber > 1 GROUP BY 1, 2
    )
    SELECT item_name, modifiers, CAST(n AS BIGINT) AS n, revenue
    FROM exploded
    """,
)
def q_pos_combo_explode(spark, sf_dir):
    """U1 combo explode under the oracle gate: every l_linenumber=1
    line becomes a combo row with the canonical modifier string; the
    rest are plain items. The oracle hand-computes what the explode
    must produce — names renamed (Smash/Chiken variants), mayo
    positionally paired, refresco unpaired, prices zeroed."""
    li = _t(spark, sf_dir, "lineitem")
    pos = li.select(
        F.col("l_orderkey").cast("string").alias("receipt_number"),
        F.when(
            F.col("l_linenumber") == 1,
            F.concat(F.lit("Combo "), F.col("l_orderkey").cast("string")),
        )
        .otherwise(F.concat(F.lit("P"), F.col("l_partkey").cast("string")))
        .alias("item_name"),
        F.col("l_extendedprice").alias("price"),
        (F.col("l_extendedprice") * 0.6).alias("cost"),
        F.when(F.col("l_linenumber") == 1, F.lit(_COMBO_MODS))
        .otherwise(F.lit("Mayonesa(Ajo)"))
        .alias("modifiers"),
    )
    return explode_combo_items(pos).groupBy("item_name", "modifiers").agg(
        F.count(F.lit(1)).alias("n"),
        _sum_dec("price", "revenue"),
    )


# Deterministic item names exercising the classifier suite (C3–C7):
# beverage category, beverage standardization, mayo standardization.
_ITEMS = [
    "Malteada Chocolate",
    "Agua mineral",
    "Refresco Coca",
    "Agua natural",
    "Doble Chicken",
]
# Hand-derived expectations for the oracle:
#   beverage_category: malteada→Malteadas, agua→Aguas, else Refrescos
#   standardize_beverage_name: mineral→Agua Mineral,
#     natural|embotellada→Agua Embotellada, else passthrough
_BEV_CAT = ["Malteadas", "Aguas", "Refrescos", "Aguas", "Refrescos"]
_BEV_STD = [
    "Malteada Chocolate",
    "Agua Mineral",
    "Refresco Coca",
    "Agua Embotellada",
    "Doble Chicken",
]
_MAYO_IN = [
    "Mayonesa(Ajo)",
    "Sin mayonesa",
    "Mayonesa(Chipotle)",
    "sin Mayonesa extra",
    "Chipotle",
]
_MAYO_OUT = [
    "Mayonesa(Ajo)",
    "Natural",
    "Mayonesa(Chipotle)",
    "Natural",
    "Chipotle",
]


@register(
    "pos_classifiers",
    f"""
    WITH m AS (
      SELECT l_partkey % 5 AS k, count(*) AS n FROM lineitem GROUP BY 1
    )
    SELECT CASE k {' '.join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(_BEV_CAT))} END
             AS category,
           CASE k {' '.join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(_BEV_STD))} END
             AS std_name,
           CASE k {' '.join(f"WHEN {i} THEN '{v}'" for i, v in enumerate(_MAYO_OUT))} END
             AS mayo,
           CAST(SUM(n) AS BIGINT) AS n
    FROM m GROUP BY 1, 2, 3
    """,
)
def q_pos_classifiers(spark, sf_dir):
    """C4/C5/C6 classifier chains under the oracle gate: synthesize
    beverage/mayo strings keyed on l_partkey % 5, classify with the
    REAL F.when chains, aggregate. The oracle hand-codes the expected
    mapping — any drift in the chains breaks the hash."""
    from pos_api_pipeline_spark.operators.classifiers import (
        beverage_category,
        standardize_beverage_name,
        standardize_mayo,
    )

    li = _t(spark, sf_dir, "lineitem")
    item_arr = F.array(*[F.lit(x) for x in _ITEMS])
    mayo_arr = F.array(*[F.lit(x) for x in _MAYO_IN])
    k = (F.pmod("l_partkey", F.lit(5)) + 1).cast("int")
    pos = li.select(
        F.element_at(item_arr, k).alias("item_name"),
        F.element_at(mayo_arr, k).alias("mayo_raw"),
    )
    return (
        pos.select(
            beverage_category("item_name").alias("category"),
            standardize_beverage_name("item_name").alias("std_name"),
            standardize_mayo("mayo_raw").alias("mayo"),
        )
        .groupBy("category", "std_name", "mayo")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Figure data-preps under the oracle gate: the exact aggregates the
# 13 report charts render (plans/plots.py) — if a prep drifts, the
# figure drifts, and these hashes catch it.
# ---------------------------------------------------------------------------

# Deterministic (item, modifier) matrix keyed on part/supp keys:
# k%3 → item (one burger, two beverages), s%3 → modifier.
_FIG_ITEMS = ["Smash Burger", "Agua mineral", "Refresco Coca"]
_FIG_MODS = ["Mayonesa(Ajo)", "Mayonesa(Sin mayonesa)", "Queso extra"]


def _synth_curated(spark, sf_dir):
    """Mini curated frame from lineitem: every column the figure
    preps read (item/modifiers/order_type/price/total_money/
    timestamps/day_of_week)."""
    from pos_api_pipeline_spark.operators.cleaning import day_name

    li = _t(spark, sf_dir, "lineitem")
    items = F.array(*[F.lit(x) for x in _FIG_ITEMS])
    mods = F.array(*[F.lit(x) for x in _FIG_MODS])
    orders = F.array(*[F.lit(x) for x in _ORDER_TYPES])
    ts = F.col("l_shipdate")
    return li.select(
        F.col("l_orderkey").cast("string").alias("receipt_number"),
        F.element_at(items, (F.pmod("l_partkey", F.lit(3)) + 1).cast("int")).alias(
            "item_name"
        ),
        F.element_at(mods, (F.pmod("l_suppkey", F.lit(3)) + 1).cast("int")).alias(
            "modifiers"
        ),
        F.element_at(orders, (F.pmod("l_orderkey", F.lit(5)) + 1).cast("int")).alias(
            "order_type"
        ),
        F.col("l_extendedprice").alias("price"),
        F.col("l_extendedprice").alias("total_money"),
        ts.alias("datetime"),
        ts.alias("shifted_time"),
        day_name(ts).alias("day_of_week"),
    )


@register(
    "pos_mayo_distribution",
    """
    SELECT strftime(l_shipdate, '%Y-%m') AS month,
           'Smash Burger' AS item_name,
           CASE l_suppkey % 3 WHEN 0 THEN 'Ajo' ELSE 'Natural' END AS mayo_type,
           CAST(count(*) AS BIGINT) AS count
    FROM lineitem
    WHERE l_partkey % 3 = 0 AND l_suppkey % 3 < 2
    GROUP BY 1, 2, 3
    """,
)
def q_pos_mayo_distribution(spark, sf_dir):
    """The grouped-bar prep behind plot_monthly_mayo_comparison
    (reference: data_preparation.py:201-230): burger filter, Mayonesa
    extraction, 'sin mayonesa'→Natural, month grouping."""
    from pos_api_pipeline_spark.plans.plots import mayo_distribution

    return mayo_distribution(_synth_curated(spark, sf_dir), by_month=True)


@register(
    "pos_beverage_distribution",
    """
    SELECT CASE l_partkey % 3 WHEN 1 THEN 'Aguas' ELSE 'Refrescos' END
             AS category,
           CASE l_partkey % 3 WHEN 1 THEN 'Agua mineral'
                              ELSE 'Refresco Coca' END AS item_name,
           CAST(count(*) AS BIGINT) AS count
    FROM lineitem WHERE l_partkey % 3 <> 0
    GROUP BY 1, 2
    """,
)
def q_pos_beverage_distribution(spark, sf_dir):
    """The stacked-bar prep behind plot_beverage_distribution
    (reference: data_preparation.py:272-302): beverage filter +
    category classifier + counts."""
    from pos_api_pipeline_spark.plans.plots import beverage_distribution

    return beverage_distribution(
        _synth_curated(spark, sf_dir), by_month=False, standardize=False
    )


@register(
    "pos_weekday_traffic",
    f"""
    SELECT dayname(l_shipdate) AS day_of_week,
           CASE l_orderkey % 5
             {' '.join(
                 f"WHEN {i} THEN '{c}'"
                 for i, c in enumerate(
                     ["Restaurante", "A domicilio", "Para llevar",
                      "Otro", "Otro"]
                 )
             )}
           END AS order_category,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS count
    FROM lineitem GROUP BY 1, 2
    """,
)
def q_pos_weekday_traffic(spark, sf_dir):
    """The weekday-lines prep behind plot_sales_by_day_of_week
    (reference: data_preparation.py:338-377): order categorization +
    unique receipts per (weekday, category)."""
    from pos_api_pipeline_spark.plans.plots import weekday_traffic

    return weekday_traffic(_synth_curated(spark, sf_dir))


@register(
    "pos_daily_metrics",
    """
    SELECT strftime(l_shipdate, '%Y-%m-%d') AS date,
           (CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 100.0)
             AS total_sales,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS unique_receipts
    FROM lineitem GROUP BY 1
    """,
)
def q_pos_daily_metrics(spark, sf_dir):
    """The daily-trends prep behind plot_daily_sales_trends
    (reference: data_preparation.py:379-398). Date rendered as a
    string for engine-neutral dtype compare (like daily_sales)."""
    from pos_api_pipeline_spark.plans.plots import daily_metrics

    out = daily_metrics(_synth_curated(spark, sf_dir))
    return out.withColumn("date", F.date_format("date", "yyyy-MM-dd"))


@register(
    "pos_weekday_weekend_perf",
    """
    WITH t AS (
      SELECT CASE WHEN dayofweek(l_shipdate) IN (0, 5, 6)
                  THEN 'Weekend' ELSE 'Weekday' END AS period_type,
             l_orderkey, l_extendedprice
      FROM lineitem
    ), agg AS (
      SELECT period_type,
             (CAST(SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 100.0)
               AS total_revenue,
             CAST(count(DISTINCT l_orderkey) AS BIGINT) AS total_receipts
      FROM t GROUP BY 1
    )
    SELECT period_type, total_revenue, total_receipts,
           total_revenue / total_receipts AS avg_sale_per_receipt
    FROM agg
    """,
)
def q_pos_weekday_weekend_perf(spark, sf_dir):
    """The triptych prep behind plot_weekday_vs_weekend_comparison
    (reference: cumulative_report.py:363-380; weekend = Fri+Sat+Sun,
    T13's deliberate rule)."""
    from pos_api_pipeline_spark.plans.plots import weekday_weekend_performance

    return weekday_weekend_performance(_synth_curated(spark, sf_dir))


@register(
    "pos_combo_choices",
    """
    WITH c AS (SELECT count(*) AS n FROM lineitem WHERE l_linenumber = 1)
    SELECT * FROM (
      SELECT 'Smash Burger' AS burger, 'Ajo' AS mayo_type,
             CAST(n AS BIGINT) AS n FROM c
      UNION ALL
      SELECT 'Chicken Burger', 'Chipotle', CAST(n AS BIGINT) FROM c
    )
    """,
)
def q_pos_combo_choices(spark, sf_dir):
    """A15 positional burger↔mayo association under the oracle gate,
    on the same synthesized combo rows as pos_combo_explode."""
    from pos_api_pipeline_spark.operators.combos import (
        analyze_combo_choices_with_mayo,
    )

    li = _t(spark, sf_dir, "lineitem")
    pos = li.filter(F.col("l_linenumber") == 1).select(
        F.concat(F.lit("Combo "), F.col("l_orderkey").cast("string")).alias(
            "item_name"
        ),
        F.lit(_COMBO_MODS).alias("modifiers"),
    )
    out = analyze_combo_choices_with_mayo(pos)
    # All combos share one modifier string → aggregate over combo names.
    return out.groupBy("burger", "mayo_type").agg(F.sum("n").alias("n"))
