"""Lake round-trip + merge-upsert + source adapter + watermark tests."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark import lake
from pos_api_pipeline_spark.sources import json_source, rest_api, state


def _curated_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "receipt_number string, item_name string, shifted_time timestamp,"
        "price double",
    )


def test_partitioned_write_roundtrip(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = _curated_rows(
        spark,
        [
            ("r1", "Burger", dt.datetime(2025, 7, 21, 10, 0), 50.0),
            ("r2", "Papas", dt.datetime(2025, 8, 2, 11, 0), 30.0),
        ],
    )
    lake.write_partitioned(df, path)
    # Hive layout: year=/month= dirs, zero-padded month.
    assert os.path.isdir(f"{path}/year=2025/month=07")
    assert os.path.isdir(f"{path}/year=2025/month=08")
    back = lake.read_lake(spark, path)
    assert back.count() == 2
    # Partition filter prunes to one directory (plan-level check).
    plan = back.filter("year = '2025' AND month = '07'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_merge_and_overwrite_dedups_latest(spark, tmp_path):
    path = str(tmp_path / "lake")
    first = _curated_rows(
        spark,
        [
            ("r1", "Burger", dt.datetime(2025, 7, 21, 10, 0), 50.0),
            ("r2", "Papas", dt.datetime(2025, 7, 21, 11, 0), 30.0),
        ],
    )
    lake.merge_and_overwrite(spark, first, path)
    # Second batch: r1/Burger re-delivered with a LATER shifted_time
    # (the re-fetch case) + one new row in a new month.
    second = _curated_rows(
        spark,
        [
            ("r1", "Burger", dt.datetime(2025, 7, 21, 12, 0), 55.0),
            ("r3", "Agua", dt.datetime(2025, 8, 1, 9, 0), 20.0),
        ],
    )
    lake.merge_and_overwrite(spark, second, path)
    out = lake.read_lake(spark, path)
    collected = out.collect()
    assert len(collected) == 3  # exactly 3 physical rows — no dup partitions
    rows = {(r.receipt_number, r.item_name): r for r in collected}
    assert rows[("r1", "Burger")].price == 55.0
    assert rows[("r1", "Burger")].shifted_time == dt.datetime(2025, 7, 21, 12, 0)
    assert rows[("r2", "Papas")].price == 30.0  # untouched partition survivor
    # Exactly one month=07 directory form on disk (zero-padded).
    assert os.path.isdir(f"{path}/year=2025/month=07")
    assert not os.path.isdir(f"{path}/year=2025/month=7")


def test_json_roundtrip(spark, tmp_path):
    from pos_api_pipeline_spark.schemas import RECEIPT_SCHEMA

    path = str(tmp_path / "raw")
    df = spark.createDataFrame(
        [{"receipt_number": "1-1", "receipt_date": "2025-07-21T10:00:00.000Z",
          "order": "Mesa 2"}],
        RECEIPT_SCHEMA,
    )
    json_source.save_raw_json(df, path)
    back = json_source.load_receipts_json(spark, path)
    assert back.count() == 1
    assert back.schema == RECEIPT_SCHEMA


def test_rest_incremental_watermark_filter(spark):
    pages = [
        (
            [
                {"receipt_number": "1-1", "created_at": "2025-07-02T00:00:00Z",
                 "updated_at": "2025-07-02T00:00:00Z"},
                {"receipt_number": "1-2", "created_at": "2025-07-01T00:00:00Z",
                 "updated_at": "2025-07-01T00:00:00Z"},
            ],
            None,
        )
    ]

    def fetch(cursor):
        return pages[0]

    out = rest_api.fetch_incremental(
        spark, fetch, last_timestamp="2025-07-01T12:00:00Z"
    )
    assert [r.receipt_number for r in out.collect()] == ["1-1"]


def test_rest_pagination(spark):
    chunks = {None: ([{"receipt_number": "a"}], "c1"),
              "c1": ([{"receipt_number": "b"}], None)}

    def fetch(cursor):
        return chunks[cursor]

    rows = list(rest_api.paginate(fetch))
    assert [r["receipt_number"] for r in rows] == ["a", "b"]


def test_watermark_state_roundtrip(spark, tmp_path):
    sf = str(tmp_path / "state.json")
    # Fallback: month start in UTC ISO format.
    wm0 = state.read_last_timestamp(sf)
    assert wm0.endswith("Z") and "T" in wm0
    df = spark.createDataFrame(
        [("2025-07-21T10:00:00Z",), ("2025-07-22T10:00:00Z",)],
        "updated_at string",
    )
    wm = state.update_last_timestamp(sf, df)
    assert wm == "2025-07-22T10:00:00Z"
    assert state.read_last_timestamp(sf) == wm
    assert json.load(open(sf))[state.STATE_KEY] == wm
    # Empty batch: watermark not advanced (at-least-once redelivery).
    empty = spark.createDataFrame([], "updated_at string")
    assert state.update_last_timestamp(sf, empty) is None
    assert state.read_last_timestamp(sf) == wm


def test_catalog_registration_and_partition_recovery(spark, tmp_path):
    # S13 — external table over the Hive layout + recoverPartitions.
    path = str(tmp_path / "lake")
    df = _curated_rows(
        spark,
        [("r1", "Burger", dt.datetime(2025, 7, 21, 10, 0), 50.0),
         ("r2", "Papas", dt.datetime(2025, 8, 2, 11, 0), 30.0)],
    )
    lake.write_partitioned(df, path)
    spark.sql("DROP TABLE IF EXISTS curated_ext")
    spark.catalog.createTable(
        "curated_ext", path=path, source="parquet"
    )
    lake.recover_partitions(spark, "curated_ext")
    got = spark.sql(
        "SELECT count(*) AS n FROM curated_ext WHERE year = '2025' AND month = '07'"
    ).collect()[0].n
    assert got == 1
    spark.sql("DROP TABLE curated_ext")


def test_scd2_merge_versions(spark, tmp_path):
    path = str(tmp_path / "dim")
    u1 = spark.createDataFrame(
        [("burger", 50.0, dt.datetime(2025, 1, 1)),
         ("papas", 30.0, dt.datetime(2025, 1, 1))],
        "item string, price double, updated timestamp",
    )
    lake.scd2_merge(spark, path, u1, key="item", ts_col="updated",
                    tracked_cols=["price"])
    # Price change for burger; papas unchanged (no-op).
    u2 = spark.createDataFrame(
        [("burger", 55.0, dt.datetime(2025, 2, 1)),
         ("papas", 30.0, dt.datetime(2025, 2, 1))],
        "item string, price double, updated timestamp",
    )
    lake.scd2_merge(spark, path, u2, key="item", ts_col="updated",
                    tracked_cols=["price"])
    dim = spark.read.parquet(path)
    rows = [(r.item, r.price, r.is_current) for r in dim.collect()]
    assert sorted(rows) == [
        ("burger", 50.0, False),   # closed version
        ("burger", 55.0, True),    # current
        ("papas", 30.0, True),     # unchanged — single version
    ]
    closed = dim.filter("item = 'burger' AND NOT is_current").collect()[0]
    assert closed.valid_to == dt.datetime(2025, 2, 1)


def test_enrich_with_items(spark):
    from pos_api_pipeline_spark.operators.enrich import enrich_with_items

    curated = spark.createDataFrame(
        [("Burger", 55.0), ("Mystery", 10.0)], "item_name string, price double"
    )
    items = spark.createDataFrame(
        [("Burger", 50.0), ("Papas", 30.0)], "item_name string, price double"
    )
    out = {r.item_name: r for r in enrich_with_items(curated, items).collect()}
    assert out["Burger"].catalog_price == 50.0
    assert out["Burger"].price_vs_catalog == pytest.approx(1.1)
    assert out["Mystery"].catalog_price is None
    assert out["Mystery"].price_vs_catalog is None


def test_watermark_from_lake(spark, tmp_path):
    path = str(tmp_path / "lake")
    df = _curated_rows(
        spark, [("r1", "Burger", dt.datetime(2025, 7, 21, 10, 0), 50.0)]
    )
    lake.write_partitioned(df, path)
    assert state.watermark_from_lake(spark, path) == "2025-07-21T10:00:00.000Z"
    assert state.watermark_from_lake(spark, str(tmp_path / "missing")) is None


def test_csv_and_single_parquet_sinks(spark, tmp_path):
    df = _curated_rows(
        spark,
        [
            ("1-1", "Burger", dt.datetime(2025, 7, 1, 12, 0), 100.0),
            ("1-2", "Fries", dt.datetime(2025, 7, 2, 13, 0), 50.0),
        ],
    )
    csv_path = str(tmp_path / "out_csv")
    lake.write_csv(df, csv_path)
    back = spark.read.option("header", True).csv(csv_path)
    assert back.count() == 2
    assert set(back.columns) == set(df.columns)

    pq_path = str(tmp_path / "out_pq")
    lake.write_single_parquet(df, pq_path)
    files = [
        f
        for f in os.listdir(pq_path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    # coalesce(1): exactly one data file, full fidelity on read-back
    assert len(files) == 1
    got = {r.receipt_number: r.price for r in spark.read.parquet(pq_path).collect()}
    assert got == {"1-1": 100.0, "1-2": 50.0}


def test_write_sorted_rowgroup_ranges(spark, tmp_path):
    """Sorted layout → per-file parquet column ranges are narrow and
    (near-)disjoint, and a point predicate prunes row groups. We
    assert the physical property directly via pyarrow metadata."""
    import pyarrow.parquet as pq

    from pos_api_pipeline_spark import lake

    path = str(tmp_path / "sorted")
    df = (
        spark.range(10_000)
        .selectExpr("id", "cast(id % 97 as double) as v")
        .repartition(4)
    )
    lake.write_sorted(df, path, ["id"])

    import glob

    ranges = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # id
            ranges.append((col.statistics.min, col.statistics.max))
    assert ranges, "no row groups written"
    # Within every file+row-group, ids are contiguous-sorted: the
    # range width equals rows-1 only if perfectly dense, but sorted
    # ranges must at least not interleave WITHIN a file. Check the
    # global property that matters for skipping: total covered width
    # is close to 10k, i.e. ranges don't all span the whole domain.
    widths = [hi - lo for lo, hi in ranges]
    assert sum(widths) < 10_000 * 1.5, (
        "row-group ranges overlap heavily — sort-within-partitions "
        f"did not narrow them: {ranges}"
    )
    # Read back with a point filter: result correct.
    got = spark.read.parquet(path).filter("id = 1234").collect()
    assert len(got) == 1 and got[0].v == 1234 % 97


def test_write_zordered_skips_on_both_dims(spark, tmp_path):
    """Z-order layout: per-file min/max must be narrow in BOTH
    interleaved columns, and much narrower than a single-key sort's
    trailing column. Asserted physically via parquet metadata."""
    import glob

    import pyarrow.parquet as pq

    from pos_api_pipeline_spark import lake

    df = spark.range(16_384).selectExpr(
        "cast(id % 128 as long) as x",
        "cast(id div 128 as long) as y",
        "id as payload",
    )
    zpath = str(tmp_path / "zorder")
    spath = str(tmp_path / "sorted")
    lake.write_zordered(df, zpath, ["x", "y"], n_files=16)
    lake.write_sorted(df, spath, ["x"])  # y is unclustered here

    def frac_covered(path, col_idx):
        total = 0.0
        n = 0
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                total += st.max - st.min
                n += 1
        return total / n if n else 0.0

    # In the z-ordered layout the mean per-row-group span of BOTH
    # dims must be well below the full domain (128); in the x-sorted
    # layout y spans nearly everything.
    zx, zy = frac_covered(zpath, 0), frac_covered(zpath, 1)
    sy = frac_covered(spath, 1)
    assert zx < 128 * 0.6 and zy < 128 * 0.6, (zx, zy)
    assert zy < sy * 0.6, (zy, sy)
    # correctness: point filter on both dims
    got = spark.read.parquet(zpath).filter("x = 5 and y = 7").collect()
    assert len(got) == 1 and got[0].payload == 7 * 128 + 5


def test_zorder_key_interleaves_bits(spark):
    from pos_api_pipeline_spark import lake

    df = spark.createDataFrame([(0b101, 0b011)], "a long, b long")
    key = df.select(lake.zorder_key(["a", "b"]).alias("k")).collect()[0].k
    # a bits at even slots, b bits at odd: a=101, b=011 ->
    # bit pairs (b1 a1)(b0 a0)... = 0b011011 -> wait, compute directly:
    expect = 0
    for i in range(16):
        expect |= ((0b101 >> i) & 1) << (2 * i)
        expect |= ((0b011 >> i) & 1) << (2 * i + 1)
    assert key == expect


def test_orc_sink_roundtrip_partitioned(spark, tmp_path):
    df = _curated_rows(
        spark,
        [
            ("1-1", "Burger", dt.datetime(2025, 7, 1, 12, 0), 100.0),
            ("1-2", "Fries", dt.datetime(2025, 8, 2, 13, 0), 50.0),
        ],
    ).withColumn("month", F.date_format("shifted_time", "MM"))
    path = str(tmp_path / "out_orc")
    lake.write_orc(df, path, partition_cols=["month"])
    # Hive-style partition directories, like the parquet lake.
    assert sorted(
        d for d in os.listdir(path) if d.startswith("month=")
    ) == ["month=07", "month=08"]
    back = lake.read_orc(spark, path)
    got = {r.receipt_number: r.price for r in back.collect()}
    assert got == {"1-1": 100.0, "1-2": 50.0}
    # Partition pruning reaches the ORC scan.
    plan = back.filter(F.col("month") == "07")._jdf.queryExecution().executedPlan().toString()
    assert "month=07" in plan or "PartitionFilters" in plan


def test_write_with_bloom_embeds_filters(spark, tmp_path):
    df = spark.range(20000).selectExpr(
        "id", "concat('user_', id) AS user_key", "id % 7 AS v"
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    df.coalesce(1).write.parquet(plain)
    lake.write_with_bloom(
        df.coalesce(1), bloomed, bloom_cols=["user_key"], expected_ndv=20000
    )

    def data_bytes(p):
        return sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if f.endswith(".parquet")
        )

    # A 20k-ndv split-block bloom filter is ~tens of KB per row group —
    # its presence is unmistakable in the file footprint (pyarrow here
    # can't expose bloom offsets, so the size delta is the check).
    delta = data_bytes(bloomed) - data_bytes(plain)
    assert delta > 10_000, delta
    # Full fidelity on read-back, and point probes still answer.
    got = spark.read.parquet(bloomed).filter("user_key = 'user_19999'")
    assert got.count() == 1


def test_read_lake_evolved_merges_file_generations(spark, tmp_path):
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    path = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a")], "id long, name string"
    ).write.parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, rating double"
    ).write.mode("append").parquet(path)

    merged = lake.read_lake_evolved(spark, path)
    got = {r.id: r for r in merged.collect()}
    assert set(merged.columns) == {"id", "name", "rating"}
    assert got[1].rating is None and got[2].rating == 9.5

    # Target contract: stable order/types for downstream operators.
    target = StructType([
        StructField("id", LongType()),
        StructField("rating", DoubleType()),
        StructField("name", StringType()),
    ])
    conformed = lake.read_lake_evolved(spark, path, target)
    assert conformed.columns == ["id", "rating", "name"]


def test_snapshot_diff_classifies_changes(spark):
    from pos_api_pipeline_spark.lake import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 31.0), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged → absent
    # restricting compare columns hides the change
    got2 = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"], compare_cols=["s"]).collect()
    }
    assert got2 == {1: "removed", 4: "added"}
    # null vs empty-string must differ (null-tagged concat)
    o2 = spark.createDataFrame([(1, None)], "k long, s string")
    n2 = spark.createDataFrame([(1, "")], "k long, s string")
    assert [r.change_type for r in snapshot_diff(o2, n2, ["k"]).collect()] == [
        "changed"
    ]


def test_json_quarantine_splits_bad_records(spark, tmp_path):
    from pyspark.sql import types as T

    from pos_api_pipeline_spark.sources.json_source import (
        load_json_with_quarantine,
    )

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2, "name": "also ok"}\n'
        'this is not json at all\n'
        '{"id": "NOT_A_NUMBER", "name": "type clash"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    good, quarantined, unpersist = load_json_with_quarantine(
        spark, str(p), schema
    )
    assert sorted(r.id for r in good.collect()) == [1, 2]
    assert good.columns == ["id", "name"]
    bad = [r.raw_record for r in quarantined.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert any("NOT_A_NUMBER" in b for b in bad)
    # the shared parse is cached (SPARK-21610); the handle releases
    # it. Assert on the DELTA of the session-wide persistent count —
    # other tests on the session-scoped spark fixture may have live
    # caches of their own, so absolute counts are order-dependent.
    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    assert before >= 1  # ours is live
    unpersist()
    assert n_persistent() == before - 1
