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

import threading
from collections.abc import Callable, Hashable

from pyspark.sql import Column

_CACHE: dict = {"ctx": None, "cols": {}}
# RLock, not Lock: build() runs under the lock, and a builder that
# itself memoizes a sub-expression (nested memo_expr) must re-enter
# rather than deadlock. Re-entrant first-builds are still each
# executed at most once per context.
_LOCK = threading.RLock()


def memo_expr(key: Hashable, build: Callable[[], Column]) -> Column:
    """Return the cached Column for ``key``, building it once per
    SparkContext. ``key`` must capture every parameter the built
    expression depends on (column names, dims, table ids...); the
    builder's qualified name is hashed into the stored key so two
    call sites using the same parameter tuple can never hand each
    other a stale expression. Thread-safe: a lock guards the
    context-reset check and first-build (concurrent first-builds
    would otherwise race; Column construction is driver-side and
    cheap enough to hold the lock across)."""
    from pyspark import SparkContext

    full_key = (getattr(build, "__qualname__", repr(build)), key)
    ctx = SparkContext._active_spark_context
    with _LOCK:
        if _CACHE["ctx"] is not ctx:
            _CACHE["ctx"] = ctx
            _CACHE["cols"] = {}
        col = _CACHE["cols"].get(full_key)
        if col is None:
            col = build()
            _CACHE["cols"][full_key] = col
    return col
