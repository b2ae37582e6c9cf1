"""Streaming operators over an event stream (SURVEY.md §2.8).

The reference is batch micro-incremental — a JSON watermark file, a
daily trigger, client-side dedup (reference: etl/extract.py:201-252,
etl/load.py:202-203). This module is the genuine streaming expression
of the same concepts:

| reference concept            | here                                   |
| ---------------------------- | -------------------------------------- |
| watermark JSON state         | checkpoint + ``withWatermark``         |
| re-fetch dedup, latest wins  | ``dropDuplicates`` within watermark    |
| hourly time_slot buckets     | tumbling ``F.window(ts, '1 hour')``    |
| daily batch cadence          | ``trigger(availableNow=True)``         |
| (absent) sessions            | ``session_window`` + stateful op       |

Every transformation here is identical for batch and streaming input
(Spark's unified API): the batch twin of each is oracle-checked in
the registry; streaming execution is covered by tests using the
file source + memory sink with ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_event_stream(
    spark, path: str, schema, max_files_per_trigger: int | None = None
):
    """File-based event stream (for tests/local; swap format for
    kafka at deployment — the downstream plan is identical)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def hourly_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Tumbling hourly aggregation with a late-data watermark: counts
    + value sums per (hour window, event_type). State for a window is
    dropped once the watermark passes window end + threshold — bounded
    state, the non-negotiable at stream scale."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(ts_col, "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "2 hours",
    slide: str = "1 hour",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Sliding-window variant (each event lands in window/slide
    overlapping windows)."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys=("event_id",),
    ts_col: str = "ts",
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Streaming twin of the reference's re-fetch dedup
    (etl/load.py:202-203): exactly-once per key within the watermark
    horizon; state for old keys is reclaimed as the watermark
    advances.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+), which dedups
    on the keys ALONE while still bounding state by the event-time
    watermark — a re-delivered event with the same event_id but a
    newer timestamp (the reference's re-fetch-with-newer-updated_at
    case) is correctly dropped. Plain ``dropDuplicates([*keys, ts])``
    would treat it as a new event."""
    return events.withWatermark(ts_col, late_threshold).dropDuplicatesWithinWatermark(
        list(keys)
    )


def session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    late_threshold: str = "1 hour",
) -> DataFrame:
    """Session windows (gap-based), the streaming-native form of the
    batch sessionization in the registry (user_sessions query)."""
    return (
        events.withWatermark(ts_col, late_threshold)
        .groupBy(F.session_window(ts_col, gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    attribution_window: str = "1 hour",
    late_threshold: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the
    clicks of the same user within the preceding attribution window.

    Both sides carry watermarks so Spark can bound the join state:
    click state is dropped once no purchase's window can reach it.
    The time-range predicate (purchase.ts - window <= click.ts <=
    purchase.ts) is what makes the state finite — an unconstrained
    stream-stream join would buffer forever.
    """
    c = clicks.select(
        F.col(user_col).alias("user_id"),
        F.col(ts_col).alias("click_ts"),
        F.col("event_id").alias("click_id"),
    ).withWatermark("click_ts", late_threshold)
    p = purchases.select(
        F.col(user_col).alias("p_user_id"),
        F.col(ts_col).alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", late_threshold)
    return c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select("user_id", "click_id", "purchase_id", "click_ts",
             "purchase_ts", "purchase_value")


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
):
    """Drive a streaming query to completion over all currently
    available input (availableNow semantics via
    processAllAvailable) and return the started query. Caller reads
    results from ``SELECT * FROM {query_name}`` and stops the query."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    return q


def enrich_stream_with_dim(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_cols: tuple[str, ...] = ("c_mktsegment", "c_nationkey"),
) -> DataFrame:
    """Stream-static enrichment: join the event stream against a
    batch dimension (e.g. the customer table) with an explicit
    broadcast hint — per micro-batch the dim is hashed once and the
    stream side never shuffles, the only join shape that holds up
    when the stream runs at cluster scale. Left join: events with no
    dim row pass through with nulls (never drop stream data on a
    late-arriving dimension).

    The static side is re-read per micro-batch by Spark, so a slowly
    refreshed dim parquet is picked up without restarting the query.
    """
    sel = dim.select(
        F.col(dim_key).alias(stream_key), *[F.col(c) for c in dim_cols]
    )
    return events.join(F.broadcast(sel), on=stream_key, how="left")
