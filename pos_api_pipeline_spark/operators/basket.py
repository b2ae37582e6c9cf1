"""Market-basket mining — frequent itemsets + association rules.

Spark-first replacement for the reference's mlxtend
TransactionEncoder → apriori → association_rules pipeline
(reference: reporting/cumulative_report.py:122-160) using
``pyspark.ml.fpm.FPGrowth``. FP-Growth is the distributed-native
algorithm (apriori's candidate generation explodes at scale; FPGrowth
builds per-partition FP-trees and merges).

mlxtend parity (SURVEY.md §7.4.10): mlxtend derives rules from ALL
frequent itemsets with ``metric='lift', min_threshold=0.5``; Spark's
``associationRules`` filters by minConfidence — so we run with
``minConfidence=0.0`` and post-filter on lift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.analytics import basket_lists


def frequent_itemsets_and_rules(
    df: DataFrame,
    basket_key: str = "receipt_number",
    item_col: str = "item_name",
    min_support: float = 0.01,
    min_lift: float = 0.5,
):
    """A12 + A13 — build baskets, mine itemsets, derive rules.

    Returns (itemsets_df, rules_df):
    - itemsets: (items array, freq, support)
    - rules: (antecedent, consequent, confidence, lift, support),
      lift-filtered and lift-descending like the reference
      (cumulative_report.py:150-157).
    """
    from pyspark.ml.fpm import FPGrowth

    baskets = basket_lists(df, basket_key, item_col).cache()
    n_baskets = baskets.count()

    fp = FPGrowth(
        itemsCol="items", minSupport=min_support, minConfidence=0.0
    )
    model = fp.fit(baskets)

    itemsets = model.freqItemsets.withColumn(
        "support", F.col("freq") / F.lit(n_baskets)
    )
    rules = (
        model.associationRules.filter(F.col("lift") >= min_lift)
        .orderBy(F.desc("lift"), F.asc(F.to_json("antecedent")))
    )
    baskets.unpersist()
    return itemsets, rules


def item_pair_counts(
    df: DataFrame,
    basket_key: str = "receipt_number",
    item_col: str = "item_name",
) -> DataFrame:
    """SQL-expressible co-occurrence core of basket mining: distinct
    item pairs per basket with support counts — the exact joint
    frequencies FPGrowth's 2-itemsets report, derivable by self-join,
    so it can be oracle-checked. Pair ordered (a < b) to avoid double
    counting.

    Scale note: bucket-pair form, not a self-join on the basket key —
    collect_set dedups items inside one shuffle on the key, each
    basket row emits its own sorted i<j pairs as an array expression
    (a basket contributes each pair exactly once by construction),
    and a second shuffle counts per pair. One scan, two exchanges;
    the join form needed a distinct exchange plus two co-partitioned
    join sides that never plan a ReusedExchange. A viral basket's
    quadratic fan-out sits in one task either way — cap basket size
    upstream if that regime is expected.
    """
    baskets = (
        df.groupBy(F.col(basket_key).alias("bk"))
        .agg(F.array_sort(F.collect_set(F.col(item_col))).alias("items"))
        .filter(F.size("items") > 1)
    )
    m = F.col("items")
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(m) - 1),
            lambda i: F.transform(
                F.slice(m, i + 1, F.size(m) - i),
                lambda other: F.struct(
                    F.element_at(m, i).alias("item_a"), other.alias("item_b")
                ),
            ),
        )
    )
    return (
        baskets.select(F.explode_outer(pair_structs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(
            F.col("p.item_a").alias("item_a"), F.col("p.item_b").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
