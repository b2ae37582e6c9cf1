"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running aggregates that survive across micro-batches — the
pattern for anything Structured Streaming's built-in aggregations
can't express (custom eviction, conditional resets, per-key ML
state). State is one small tuple per key, Arrow-batched in and out;
at scale the state store shards by key with the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark) -> None:
    """Config-only switch to the RocksDB state store for streaming
    stateful operators.

    The default HDFS-backed provider keeps every key's state in
    executor heap — fine for bounded keyspaces, deadly at 100 TB where
    per-user state can be billions of keys. RocksDB spills to local
    disk with an in-memory working set, and changelog checkpointing
    uploads only the per-batch delta instead of snapshotting the full
    store. Applies to queries STARTED after this call (provider is
    read from session conf at query start and then pinned in the
    checkpoint)."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum, max) per user.

    Each micro-batch emits the updated running totals for every user
    present in the batch; state persists across batches via the state
    store. The handler is pure pandas over Arrow batches — no row
    loops.
    """

    def update(key, pdfs, state):
        user_id = key[0]
        n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
        import pandas as pd

        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx if mx != float("-inf") else None],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
