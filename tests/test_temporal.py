"""As-of join, range join, IVF ANN, and stateful streaming tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.temporal import asof_join, range_join


def test_asof_join_backward_inclusive(spark):
    trades = spark.createDataFrame(
        [
            ("A", dt.datetime(2024, 1, 1, 10, 0), 1),
            ("A", dt.datetime(2024, 1, 1, 10, 5), 2),
            ("A", dt.datetime(2024, 1, 1, 10, 10), 3),
            ("B", dt.datetime(2024, 1, 1, 10, 2), 4),
        ],
        "sym string, t timestamp, trade_id int",
    )
    quotes = spark.createDataFrame(
        [
            ("A", dt.datetime(2024, 1, 1, 9, 59), 100.0),
            ("A", dt.datetime(2024, 1, 1, 10, 5), 101.0),  # ties trade 2
            ("B", dt.datetime(2024, 1, 1, 10, 3), 200.0),  # after B's trade
        ],
        "sym string, q_ts timestamp, quote double",
    )
    out = {
        r.trade_id: (r.quote, r.q_ts)
        for r in asof_join(
            trades, quotes, on="sym", left_ts="t", right_ts="q_ts",
            value_cols=["quote"],
        ).collect()
    }
    assert out[1] == (100.0, dt.datetime(2024, 1, 1, 9, 59))
    assert out[2][0] == 101.0  # equal timestamps match (inclusive)
    assert out[3][0] == 101.0  # latest preceding carried forward
    assert out[4] == (None, None)  # no quote before B's trade


def test_range_join(spark):
    points = spark.createDataFrame(
        [("k", 5.0, "p1"), ("k", 15.0, "p2"), ("k", 25.0, "p3")],
        "key string, v double, name string",
    )
    intervals = spark.createDataFrame(
        [("k", 0.0, 10.0, "lo"), ("k", 10.0, 20.0, "mid")],
        "key string, lo double, hi double, tag string",
    )
    out = {
        (r.name, r.tag)
        for r in range_join(
            points, intervals, on="key", left_val="v",
            right_lo="lo", right_hi="hi", bucket_width=10.0,
        ).collect()
    }
    assert out == {("p1", "lo"), ("p2", "mid")}  # p3 outside all intervals


def test_ivf_topk_matches_brute_force_for_easy_neighbors(spark):
    from pos_api_pipeline_spark.llm.similarity import brute_force_topk, ivf_topk

    import math
    rows = []
    for i in range(40):
        angle = (i % 8) / 8.0 * 2 * math.pi
        rows.append((i, [math.cos(angle) + (i // 8) * 0.001, math.sin(angle), 0.0, 0.0]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = vecs.filter("vec_id < 2")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(vecs, qs, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(vecs, qs, dim=4, k=3, n_centroids=8, n_probe=4).collect()
    }
    # Same-direction vectors sit in the same coarse cluster → IVF
    # recovers the exact top-k here.
    assert approx == exact


def test_ivf_with_kmeans_centroids(spark):
    from pos_api_pipeline_spark.llm.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )
    from pos_api_pipeline_spark.session import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter("vec_id < 3")
    cents = kmeans_centroids(emb, n_centroids=8)
    assert cents.count() == 8
    approx = ivf_topk(emb, qs, dim=64, k=3, n_probe=4, centroids=cents)
    exact = brute_force_topk(emb, qs, k=3)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    # Trained cells with half the clusters probed: expect decent recall
    # on random data, and every result must be a valid corpus id.
    assert len(a & e) >= len(e) // 2
    assert all(q < 3 for q, _ in a)


def test_tws_closed_sessions_timer_emits_on_idle(spark, tmp_path):
    # transformWithState ships state/timer traffic between the JVM and
    # the Python driver worker over protobuf; this runtime has no
    # google.protobuf, so the operator is import-gated like the
    # multimodal codec steps. The processor logic itself is plain
    # pandas + ValueState/timer calls and runs wherever protobuf exists.
    pytest.importorskip("google.protobuf")
    import datetime as dt

    from pyspark.sql import types as T

    from pos_api_pipeline_spark.streaming.stateful import (
        tws_closed_sessions,
        use_rocksdb_state,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_ts", T.TimestampType()),
        ]
    )
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    path = str(tmp_path / "sess_in")
    # Session for user 1: two events 5s apart.
    spark.createDataFrame(
        [(1, t0), (1, t0 + dt.timedelta(seconds=5))], schema
    ).write.mode("overwrite").parquet(path)
    use_rocksdb_state(spark)  # transformWithState requires RocksDB
    try:
        stream = spark.readStream.schema(schema).parquet(path)
        q = (
            tws_closed_sessions(stream, gap_seconds=10)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("tws_sessions")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .start()
        )
        try:
            q.processAllAvailable()
            # Watermark hasn't passed start+gap: session still open.
            assert spark.sql("SELECT * FROM tws_sessions").count() == 0

            # A much later event (other user) advances the watermark far
            # past user 1's last+gap -> the event-time timer fires and
            # the closed session is emitted exactly once.
            spark.createDataFrame(
                [(2, t0 + dt.timedelta(seconds=60))], schema
            ).write.mode("append").parquet(path)
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM tws_sessions WHERE user_id = 1"
            ).collect()
            assert len(rows) == 1
            r = rows[0]
            assert r.n_events == 2
            assert (r.session_end - r.session_start).total_seconds() == 5.0
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def test_stateful_running_totals_rocksdb(spark, tmp_path):
    import datetime as dt  # noqa: F401  (parity with sibling test)

    from pyspark.sql import types as T

    from pos_api_pipeline_spark.streaming.stateful import (
        ROCKSDB_PROVIDER,
        running_user_totals,
        use_rocksdb_state,
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    path = str(tmp_path / "stream_in")
    spark.createDataFrame([(1, 10.0), (1, 20.0), (2, 5.0)], schema).write.mode(
        "overwrite"
    ).parquet(path)
    use_rocksdb_state(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        stream = spark.readStream.schema(schema).parquet(path)
        q = (
            running_user_totals(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("running_rocks")
            .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                r.user_id: (r.n_events, r.total_value)
                for r in spark.sql("SELECT * FROM running_rocks").collect()
            }
            assert got[1] == (2, 30.0)
            assert got[2] == (1, 5.0)
        finally:
            q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def test_stateful_running_totals(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import types as T

    from pos_api_pipeline_spark.streaming.stateful import running_user_totals

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    path = str(tmp_path / "stream_in")
    spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], schema
    ).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(schema).parquet(path)
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.user_id: (r.n_events, r.total_value, r.max_value)
            for r in spark.sql("SELECT * FROM running").collect()
        }
        assert got[1] == (2, 30.0, 20.0)
        assert got[2] == (1, 5.0, 5.0)

        # Second micro-batch: state carries across batches.
        spark.createDataFrame([(1, 5.0)], schema).write.mode("append").parquet(path)
        q.processAllAvailable()
        got2 = {
            r.user_id: (r.n_events, r.total_value)
            for r in spark.sql(
                "SELECT * FROM running WHERE user_id = 1 ORDER BY n_events DESC LIMIT 1"
            ).collect()
        }
        assert got2[1] == (3, 35.0)
    finally:
        q.stop()


def test_forward_fill_locf_semantics(spark):
    from pos_api_pipeline_spark.operators.temporal import forward_fill

    rows = [
        ("a", 1, None), ("a", 2, 10.0), ("a", 3, None), ("a", 4, None),
        ("a", 5, 20.0),
        ("b", 1, 5.0), ("b", 2, None),
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = {
        (r.g, r.t): r.v
        for r in forward_fill(df, "t", ["v"], partition_cols=["g"]).collect()
    }
    # leading null stays null; gaps carry the last observation
    assert out[("a", 1)] is None
    assert out[("a", 3)] == 10.0 and out[("a", 4)] == 10.0
    assert out[("a", 5)] == 20.0
    # partitions are independent
    assert out[("b", 2)] == 5.0
