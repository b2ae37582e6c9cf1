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


SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)


def tws_closed_sessions(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Streaming sessionization on the transformWithState API
    (Spark 4): emit each user's session ONLY when it closes, via an
    event-time timer — the push-style pattern applyInPandasWithState
    cannot express (it can only react to new input for a key, never to
    the *absence* of input).

    Per batch: merge the batch's min/max event time into the user's
    (start, last, n) ValueState and register a timer at last+gap. When
    the watermark passes a timer, the guard ``last + gap <= expiry``
    distinguishes a genuinely idle session (emit + clear) from a stale
    timer superseded by newer events (ignore). State is one tuple per
    user in the state store — shards with the key, and wants the
    RocksDB provider (``use_rocksdb_state``), which transformWithState
    requires anyway.

    Input needs columns (user_id, event_ts); output one row per CLOSED
    session in append mode. Expressed against the reference's
    watermark/session concepts (etl/extract.py:201-252 tracks the
    batch twin of this offset bookkeeping by hand).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_ms = int(gap_seconds) * 1000

    class _SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState(
                "sess", "start long, last long, n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            start, last, n = None, None, 0
            if self.state.exists():
                got = self.state.get()
                start, last, n = int(got[0]), int(got[1]), int(got[2])
            for pdf in rows:
                if not len(pdf):
                    continue
                ts_ms = (
                    pdf["event_ts"].astype("datetime64[ns]").astype("int64")
                    // 1_000_000
                )
                lo, hi = int(ts_ms.min()), int(ts_ms.max())
                n += len(pdf)
                start = lo if start is None else min(start, lo)
                last = hi if last is None else max(last, hi)
            if last is not None:
                self.state.update((start, last, n))
                self.handle.registerTimer(last + gap_ms)
            return iter([])

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            import pandas as pd

            fire = expiredTimerInfo.getExpiryTimeInMs()
            if self.state.exists():
                start, last, n = (int(x) for x in self.state.get())
                if last + gap_ms <= fire:
                    self.state.clear()
                    yield pd.DataFrame(
                        {
                            "user_id": [int(key[0])],
                            "session_start": [pd.Timestamp(start, unit="ms")],
                            "session_end": [pd.Timestamp(last, unit="ms")],
                            "n_events": [n],
                        }
                    )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("event_ts", f"{int(gap_seconds)} seconds")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_SessionProcessor(),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
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
