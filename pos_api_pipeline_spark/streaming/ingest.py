"""Streaming ingest into the curated lake — the reference's daily
batch loop as a genuine stream.

``foreachBatch`` gives each micro-batch a plain DataFrame + epoch id,
so the batch merge/dedup/overwrite path (lake.merge_and_overwrite)
runs unchanged per batch with exactly-once effect: the checkpoint
records the epoch, and re-processing an epoch after failure rewrites
the same partitions idempotently (the W1 dedup makes replays
converge).

This is the idiomatic upgrade path SURVEY.md §1.4 names for the
reference's fetch→transform→merge loop (reference: main.py:24-75).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pos_api_pipeline_spark import lake
from pos_api_pipeline_spark.operators.transform import run_transform


def stream_receipts_to_lake(
    receipt_stream: DataFrame,
    lake_path: str,
    checkpoint_dir: str,
):
    """Run the curation chain over a receipt stream and merge each
    micro-batch into the partitioned lake. Returns the started query
    (caller stops it / awaits termination)."""

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        curated = run_transform(batch_df)
        lake.merge_and_overwrite(batch_df.sparkSession, curated, lake_path)

    return (
        receipt_stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
