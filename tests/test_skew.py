"""salted_join: result parity with the plain join + the salt actually
spreads a hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.skew import SALT, salted_join


@pytest.fixture()
def skewed(spark):
    # 90% of rows share key 1 — the power-law regime.
    big = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k) for k in range(2, 102)],
        "k int, payload int",
    )
    small = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b"), (999, "orphan")], "k int, tag string"
    )
    return big, small


def test_salted_inner_parity(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").groupBy("k", "tag").count()
    salted = salted_join(big, small, "k", n_salts=8).groupBy(
        "k", "tag"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_parity(spark, skewed):
    big, small = skewed
    plain = sorted(
        map(tuple, big.join(small, "k", "left").collect())
    )
    salted = sorted(
        map(tuple, salted_join(big, small, "k", n_salts=4, how="left").collect())
    )
    assert plain == salted


def test_hot_key_spreads_over_salts(spark, skewed):
    big, _ = skewed
    salted = big.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(8))
    )
    n = (
        salted.filter(F.col("k") == 1)
        .select(SALT)
        .distinct()
        .count()
    )
    assert n == 8  # 900 rows of one key hit every salt bucket


def test_rejects_unsound_join_types(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full")


def test_salted_join_stays_equi_join(spark, skewed):
    big, small = skewed
    plan = (
        salted_join(big, small, "k", n_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
