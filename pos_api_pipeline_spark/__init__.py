"""pos_api_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference POS analytics pipeline
(Abnervg/POS_API_Pipeline): nested-receipt flattening, string
normalization, time bucketing, partitioned lake writes with
merge+dedup, the full reporting operator suite (top-k, grouped
aggregates, pivots, window dedup, combo explode, market-basket
mining), plus large-scale training-data-pipeline extensions
(deduplication, similarity search, text analysis, multimodal column
plumbing).

Design principles:
- DataFrame/SQL first: every operator is a pure
  ``DataFrame -> DataFrame`` function built from ``pyspark.sql.functions``
  so Catalyst can push filters, prune columns and pick join strategies.
- Zero row-at-a-time Python UDFs on the hot path; Pandas UDFs only
  where built-ins genuinely cannot express the semantics.
- Partition-first: operators assume 1000-executor / 100 TB scale even
  when tested on local[32].
"""

from pos_api_pipeline_spark.session import get_spark, read_parquet

__all__ = ["get_spark", "read_parquet"]
__version__ = "0.1.0"
