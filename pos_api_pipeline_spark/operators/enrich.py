"""Dimension enrichment — the latent `items` join surface.

The reference fetches the product catalog but never joins it
(SURVEY.md §1.1, reference: etl/extract.py:53-57 fetched,
etl/transform.py:199-222 unused). The engine models it as a proper
broadcast dimension: enrich curated lines with catalog price and a
margin column, nulls preserved for uncatalogued items.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_items(curated: DataFrame, items: DataFrame) -> DataFrame:
    """Left-join the (small) item catalog onto the line-item fact.

    Broadcast by construction — a product catalog is bounded; the
    fact table keeps its partitioning. Adds ``catalog_price`` and
    ``price_vs_catalog`` (null when uncatalogued or catalog price 0).
    """
    dim = items.select(
        F.col("item_name"),
        F.col("price").alias("catalog_price"),
    )
    out = curated.join(F.broadcast(dim), on="item_name", how="left")
    return out.withColumn(
        "price_vs_catalog",
        F.when(
            F.col("catalog_price").isNotNull() & (F.col("catalog_price") != 0),
            F.col("price") / F.col("catalog_price"),
        ),
    )
