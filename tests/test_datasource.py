"""Custom Python DataSource tests: registration, partitioned reads,
composition with the curation chain."""

from __future__ import annotations

import pytest

from pos_api_pipeline_spark.operators.transform import run_transform
from pos_api_pipeline_spark.schemas import RECEIPT_SCHEMA
from pos_api_pipeline_spark.sources.datasource import PosApiDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(PosApiDataSource)
    return spark


def test_datasource_reads_partitioned(registered):
    df = (
        registered.read.format("pos_api")
        .option("pages", "4")
        .option("page_size", "50")
        .load()
    )
    assert df.schema == RECEIPT_SCHEMA
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4  # one partition per page
    assert df.select("receipt_number").distinct().count() == 200


def test_streaming_datasource_pages_as_microbatches(registered, tmp_path):
    stream = (
        registered.readStream.format("pos_api")
        .option("pages", "3")
        .option("page_size", "10")
        .option("pages_per_batch", "1")
        .load()
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pos_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = registered.sql(
            "SELECT count(*) AS n, count(DISTINCT receipt_number) AS d FROM pos_stream"
        ).collect()[0]
        # 3 pages × 10 receipts arrive across micro-batches, no dups —
        # the checkpoint tracks page offsets exactly-once.
        assert (got.n, got.d) == (30, 30)
    finally:
        q.stop()


def test_datasource_feeds_curation_chain(registered):
    df = (
        registered.read.format("pos_api")
        .option("pages", "2")
        .option("page_size", "40")
        .load()
    )
    curated = run_transform(df)
    rows = curated.count()
    assert rows == 80 + len([i for i in range(80) if i % 4 == 0])  # extra lines
    got = {r.order_type for r in curated.select("order_type").distinct().collect()}
    # 'A domicilio 01' homogenizes to 'Para llevar' (the '01' mask wins
    # and the later 'Llevar' mask rewrites it) — no 'A domicilio' remains.
    assert got == {"Mesa 2", "Para llevar", "mostrador"}
