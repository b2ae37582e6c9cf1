"""Bloom-prefiltered contamination (llm/curation.py): exact parity
with the broadcast path, filter-rate sanity, overflow safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from pos_api_pipeline_spark.llm.curation import (
    _bloom_might_contain,
    contamination,
    contamination_bloom,
    gram_bloom_filter,
)


def _corpus(spark, n=80):
    rows = []
    for d in range(n):
        words = [f"w{(d * 7 + i) % 23}" for i in range(12)]
        rows.append((d, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_parity_with_broadcast_path(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") % 9 == 0)
    a = sorted(map(tuple, contamination(docs, bench, n=3).collect()))
    b = sorted(map(tuple, contamination_bloom(docs, bench, n=3).collect()))
    assert a == b


def test_bloom_no_false_negatives_and_low_fp(spark):
    keys = spark.range(2000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    bf, m, k = gram_bloom_filter(keys, "h")
    member = keys.join(F.broadcast(bf)).filter(
        _bloom_might_contain(F.col("h"), m, k)
    )
    assert member.count() == 2000  # every inserted key passes
    others = spark.range(2000, 12000).select(
        F.xxhash64(F.col("id").cast("string")).alias("h")
    )
    fp = others.join(F.broadcast(bf)).filter(
        _bloom_might_contain(F.col("h"), m, k)
    ).count()
    assert fp / 10000 < 0.03  # ~0.9% design point, generous bound


def test_bloom_extreme_hash_values_no_overflow(spark):
    # ANSI mode: raw h + i*h' overflows long for keys near ±2^63
    keys = spark.createDataFrame(
        [(2**63 - 1,), (-(2**63),), (-1,), (0,)], "h long"
    )
    bf, m, k = gram_bloom_filter(keys, "h", num_bits=1 << 16)
    got = keys.join(F.broadcast(bf)).filter(
        _bloom_might_contain(F.col("h"), m, k)
    ).count()
    assert got == 4

def test_gram_bloom_filter_rejects_partial_word_num_bits(spark):
    """num_bits not a multiple of 64 would silently drop bits in the
    top partial word (false negatives); the builder must refuse."""
    import pytest

    from pos_api_pipeline_spark.llm.curation import gram_bloom_filter

    keys = spark.createDataFrame([(1,), (2,)], "h long")
    for bad in (100, 63, 0, 1 << 16 | 8):
        with pytest.raises(ValueError, match="multiple of 64"):
            gram_bloom_filter(keys, "h", num_bits=bad)
