"""Temporal joins Spark lacks natively: as-of join and range join.

As-of join (backward): for each left row, the latest right row with
``right.ts <= left.ts`` within the same key — the canonical
"most recent state at event time" operator (market data, latest
purchase before a click, etc.).

Implementation is the union+window technique, NOT a per-group
``merge_asof`` Pandas UDF: tag both sides, union, and take
``last(value, ignorenulls=True)`` over a
(key ORDER BY ts, side) window running to the current row. One
shuffle on the key, no Python, state bounded by the window frame —
this survives 100 TB where a per-key ``applyInPandas`` would require
whole-group materialization.

Range join: equi-bucketize the range key, equi-join on
(key, bucket) for candidate generation, then apply the exact range
predicate — turns an O(n·m) theta-join into bucket-local work.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Backward as-of join, inclusive (right.ts == left.ts matches).

    Returns all left columns plus ``right_ts`` and ``value_cols``
    carried from the most recent right row per key; nulls where no
    right row precedes the left row. ``right_ts``/``value_cols``
    names must not collide with left columns (pre-alias the right
    side).

    Caveat: genuinely-null values in ``value_cols`` are skipped by
    the ignorenulls carry — a null value in the latest right row
    yields the previous non-null one. Carry a non-null sentinel if
    null-preserving semantics are needed.
    """
    keys = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *value_cols]

    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    )
    r_tagged = right.select(
        *keys, F.col(right_ts).alias("_ts"), *[F.col(c) for c in value_cols]
    ).withColumn(right_ts, F.col("_ts")).withColumn("_side", F.lit(0))

    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # Right rows sort before left at equal _ts (side 0 < 1) → the
    # inclusive <= semantics of ASOF.
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        u = u.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).select(*left.columns, *carried)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Equi-bucketized range join: match left rows whose ``left_val``
    falls in [right_lo, right_hi] per key.

    Right intervals are exploded across every bucket they overlap
    (interval width should be O(bucket_width) for this to pay off);
    the join is then a plain equi-join on (key, bucket) with an exact
    predicate filter — Catalyst plans a hash join, never a
    BroadcastNestedLoopJoin.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lb = F.floor(F.col(left_val) / bucket_width)
    l_b = left.withColumn("_bucket", lb.cast("long"))
    r_b = right.withColumn(
        "_buckets",
        F.sequence(
            F.floor(F.col(right_lo) / bucket_width).cast("long"),
            F.floor(F.col(right_hi) / bucket_width).cast("long"),
        ),
    ).withColumn("_bucket", F.explode_outer("_buckets")).drop("_buckets").filter(
        F.col("_bucket").isNotNull()
    )
    joined = l_b.join(r_b, [*keys, "_bucket"])
    return joined.filter(
        (F.col(left_val) >= F.col(right_lo))
        & (F.col(left_val) <= F.col(right_hi))
    ).drop("_bucket")


def forward_fill(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """LOCF (last observation carried forward) over an ordered frame:
    null values take the most recent non-null earlier value within
    the partition — the standard time-series repair after spine
    gap-filling (sensor dropouts, sparse daily metrics).

    One window per filled column over the SAME (partition, order)
    spec, so Catalyst plans a single Window operator and one shuffle
    for all of them. ``last(ignorenulls=True)`` over an unbounded
    preceding frame is the canonical Spark LOCF idiom (same machinery
    as asof_join's carry step). Leading nulls (nothing to carry) stay
    null.
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(
            c, F.last(F.col(c), ignorenulls=True).over(w)
        )
    return out
