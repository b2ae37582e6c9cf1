"""Raw JSON lake scans/sinks (SURVEY.md §2.1 S4–S6).

The reference lands raw API responses as JSON files and re-reads them
for backfills (reference: etl/extract.py:170-183,
etl/transform.py:12-27, etl/load.py:124-136). Spark-first: explicit
schema (no inference jobs at scale), native glob reads, columnar
rewrite option for anything that will be re-read more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pos_api_pipeline_spark.schemas import ITEM_SCHEMA, RECEIPT_SCHEMA


def save_raw_json(df: DataFrame, path: str) -> None:
    """S4 — raw JSON sink. Line-delimited (the distributed-friendly
    form; the reference's indented single-document JSON cannot be
    split across workers)."""
    df.write.mode("overwrite").json(path)


def load_receipts_json(
    spark: SparkSession, path_or_glob: str, multiline: bool = False
) -> DataFrame:
    """S5/S6 — raw receipts scan; globs are native, so the backfill
    'read receipts_*.json and concatenate' (etl/load.py:124-136) is
    just a path pattern. ``multiline=True`` reads the reference's
    indented-array files (each file parsed whole — not splittable;
    fine for landing-zone sizes, rewrite to JSONL beyond that)."""
    return (
        spark.read.schema(RECEIPT_SCHEMA)
        .option("multiLine", multiline)
        .json(path_or_glob)
    )


def load_items_json(
    spark: SparkSession, path_or_glob: str, multiline: bool = False
) -> DataFrame:
    return (
        spark.read.schema(ITEM_SCHEMA)
        .option("multiLine", multiline)
        .json(path_or_glob)
    )
