"""Raw JSON lake scans/sinks (SURVEY.md §2.1 S4–S6).

The reference lands raw API responses as JSON files and re-reads them
for backfills (reference: etl/extract.py:170-183,
etl/transform.py:12-27, etl/load.py:124-136). Spark-first: explicit
schema (no inference jobs at scale), native glob reads, columnar
rewrite option for anything that will be re-read more than once.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

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


class QuarantineResult(NamedTuple):
    good: DataFrame
    quarantined: DataFrame
    # Unpersist the shared parsed frame after BOTH splits are
    # materialized — without this, repeated ingestion calls in a
    # long-lived session accumulate CacheManager entries.
    unpersist: Callable[[], None]


def load_json_with_quarantine(
    spark: SparkSession, path_or_glob: str, schema
) -> QuarantineResult:
    """Schema-enforced JSON scan that QUARANTINES malformed records
    instead of silently nulling (the default PERMISSIVE trap) or
    killing the job (FAILFAST): rows that fail to parse land in a
    second frame carrying the raw line, ready for a dead-letter sink
    and replay after a fix. The standard landing-zone contract at
    scale — one bad byte in a billion-line feed must neither stop
    ingestion nor vanish.

    Returns (good, quarantined, unpersist): ``good`` has exactly
    ``schema``; ``quarantined`` is (raw_record string); ``unpersist``
    releases the shared cached parse once both splits have been
    materialized (the cache is required by SPARK-21610 — see below —
    but must not outlive the ingestion call). The corrupt-column
    mechanism is Spark-native (one scan, no UDF); the split is two
    filters over it — Catalyst shares the scan under one action.

    .. versionchanged:: r4
        Returns the 3-field ``QuarantineResult`` NamedTuple instead
        of a 2-tuple. Legacy ``good, quarantined = ...`` unpacking
        now raises ValueError — switch to attribute access
        (``res.good``, ``res.quarantined``) or 3-way unpacking, and
        call ``res.unpersist()`` once both splits are materialized.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    with_corrupt = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path_or_glob)
        # Spark requires caching/materializing before filtering on the
        # corrupt column alone (SPARK-21610: a corrupt-column-only
        # query may not touch the data columns it needs to parse).
        .cache()
    )
    good = parsed.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    quarantined = parsed.filter(
        F.col("_corrupt_record").isNotNull()
    ).select(F.col("_corrupt_record").alias("raw_record"))
    return QuarantineResult(
        good, quarantined, lambda: parsed.unpersist()
    )
