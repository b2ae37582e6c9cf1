"""Scale-hardening operator tests: skew-safe distinct, bucketed
co-located joins, small-files compaction."""

from __future__ import annotations

import datetime as dt
import glob

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark import lake
from pos_api_pipeline_spark.operators import analytics as A


def test_two_stage_count_distinct_matches_exact(spark):
    rows = [("hot", f"u{i % 7}") for i in range(100)] + [("cold", "u1")]
    df = spark.createDataFrame(rows, "k string, uid string")
    exact = {
        r.k: r.unique_count
        for r in A.count_distinct_by(df, ["k"], "uid").collect()
    }
    staged = {
        r.k: r.unique_count
        for r in A.two_stage_count_distinct(df, ["k"], "uid").collect()
    }
    assert staged == exact == {"hot": 7, "cold": 1}


def test_two_stage_ignores_null_ids(spark):
    df = spark.createDataFrame(
        [("k", "a"), ("k", None), ("k", "a")], "k string, uid string"
    )
    out = A.two_stage_count_distinct(df, ["k"], "uid").collect()
    assert out[0].unique_count == 1


def test_compact_partitions(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [
            ("r1", "A", dt.datetime(2025, 7, 1), 1.0),
            ("r2", "B", dt.datetime(2025, 7, 2), 2.0),
        ],
        "receipt_number string, item_name string, shifted_time timestamp,"
        "price double",
    )
    # Simulate accumulation: several incremental writes → many files.
    lake.write_partitioned(df, path, mode="overwrite")
    lake.write_partitioned(df, path, mode="append")
    lake.write_partitioned(df, path, mode="append")
    before = glob.glob(f"{path}/year=2025/month=07/*.parquet")
    assert len(before) >= 3
    lake.compact_partitions(spark, path, files_per_partition=1)
    after = glob.glob(f"{path}/year=2025/month=07/*.parquet")
    assert len(after) == 1
    assert lake.read_lake(spark, path).count() == 6  # rows preserved


def test_bucketed_join_skips_shuffle(spark):
    # warehouse dir is a tmp path (static conf set in the conftest
    # session fixture).
    facts = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    dims = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("d").alias("tag")
    )
    lake.write_bucketed(facts, "b_facts", "k", n_buckets=4)
    lake.write_bucketed(dims, "b_dims", "k", n_buckets=4)
    f, d = spark.table("b_facts"), spark.table("b_dims")
    # Disable broadcast so the join strategy decision is about
    # shuffles, then assert the co-bucketed join plans NO exchange.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            f.join(d, "k")._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "Exchange" not in plan
    assert f.join(d, "k").count() == 100
