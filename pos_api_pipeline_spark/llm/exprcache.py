"""Per-SparkContext memoization of constructed Column expressions.

The signature family (hyperplane buckets, JL projections, SimHash
vote sums, bucket-pair struct generators) builds wide, deeply nested
expression trees — dozens of higher-order-function folds over
64-element literals. Driver-side construction + analysis of those
trees measured 1.7–2.7 s per query at bench scale, more than their
execution. A ``pyspark.sql.Column`` is immutable and refers to inputs
by NAME, so a constructed expression is safely reusable across
DataFrames within one SparkContext; the cache resets when the context
changes (stale JVM references would break).

Only context-free expressions belong here: anything referencing a
specific DataFrame (joins, groupBys) must not be cached.
"""

from __future__ import annotations

from collections.abc import Callable, Hashable

from pyspark.sql import Column

_CACHE: dict = {"ctx": None, "cols": {}}


def memo_expr(key: Hashable, build: Callable[[], Column]) -> Column:
    """Return the cached Column for ``key``, building it once per
    SparkContext. ``key`` must capture every parameter the built
    expression depends on (column names, dims, table ids...)."""
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    if _CACHE["ctx"] is not ctx:
        _CACHE["ctx"] = ctx
        _CACHE["cols"] = {}
    col = _CACHE["cols"].get(key)
    if col is None:
        col = build()
        _CACHE["cols"][key] = col
    return col
