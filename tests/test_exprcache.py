"""Units for llm/exprcache.memo_expr — the driver-side expression
memo behind the signature family (ADVICE r4: lock the cache, key by
builder so same-parameter call sites can't collide)."""

import threading

from pyspark.sql import functions as F

from pos_api_pipeline_spark.llm.exprcache import _CACHE, memo_expr


def _drain():
    _CACHE["ctx"] = None
    _CACHE["cols"] = {}


def test_memo_returns_same_object_for_same_key(spark):
    _drain()
    builds = []

    def build():
        builds.append(1)
        return F.lit(1) + F.lit(2)

    a = memo_expr(("t", 3), build)
    b = memo_expr(("t", 3), build)
    assert a is b
    assert len(builds) == 1


def test_memo_distinguishes_builders_with_same_key(spark):
    _drain()

    def build_one():
        return F.lit(1)

    def build_two():
        return F.lit(2)

    a = memo_expr(("same", "key"), build_one)
    b = memo_expr(("same", "key"), build_two)
    assert a is not b
    # and each later call still hits its own entry
    assert memo_expr(("same", "key"), build_one) is a
    assert memo_expr(("same", "key"), build_two) is b


def test_memo_concurrent_first_build_races_once(spark):
    _drain()
    builds = []
    barrier = threading.Barrier(8)
    got = []

    def build():
        builds.append(1)
        return F.lit(42)

    def worker():
        barrier.wait()
        got.append(memo_expr(("race",), build))

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(builds) == 1
    assert all(g is got[0] for g in got)


def test_memo_resets_on_context_change(spark):
    _drain()
    calls = []

    def build():
        calls.append(1)
        return F.lit(7)

    memo_expr(("ctx",), build)
    # simulate a new SparkContext: cache must rebuild, not hand back
    # a Column bound to dead JVM references
    _CACHE["ctx"] = object()
    memo_expr(("ctx",), build)
    assert len(calls) == 2
