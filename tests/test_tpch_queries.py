"""Batch-4 join-depth queries: semantics on tiny frames + physical
plan properties (broadcast chains, hash-join-only range join)."""

from __future__ import annotations

import datetime as dt
import re

import __spark_entry__ as entry
from pyspark.sql import functions as F

from pos_api_pipeline_spark.operators.temporal import range_join

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# range_join semantics
# ---------------------------------------------------------------------------


def test_range_join_matches_exact_predicate(spark):
    left = spark.createDataFrame(
        [(1, 5.0), (1, 17.0), (1, 30.0), (2, 5.0)], "k int, v double"
    )
    right = spark.createDataFrame(
        [(1, 0.0, 10.0, "a"), (1, 15.0, 40.0, "b"), (2, 100.0, 200.0, "c")],
        "k int, lo double, hi double, tag string",
    )
    out = range_join(
        left, right, on="k", left_val="v", right_lo="lo", right_hi="hi",
        bucket_width=7.0,
    )
    got = {(r.k, r.v, r.tag) for r in out.collect()}
    assert got == {(1, 5.0, "a"), (1, 17.0, "b"), (1, 30.0, "b")}


def test_range_join_inclusive_bounds(spark):
    left = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k int, v double")
    right = spark.createDataFrame(
        [(1, 10.0, 20.0, "x")], "k int, lo double, hi double, tag string"
    )
    out = range_join(
        left, right, on="k", left_val="v", right_lo="lo", right_hi="hi",
        bucket_width=100.0,
    )
    assert out.count() == 2  # both endpoints match


def test_range_join_plans_hash_join_not_nested_loop(spark):
    """The whole point of the bucketization: Catalyst must see an
    equi-join. A BroadcastNestedLoopJoin/CartesianProduct here means
    the operator regressed to the O(n*m) theta-join."""
    for name in ("event_session_assignment", "click_attribution"):
        plan = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name


# ---------------------------------------------------------------------------
# TPC-H-shape queries: golden semantics on a hand-built micro-corpus
# ---------------------------------------------------------------------------


def test_late_orders_semi_join_counts_each_order_once(spark, tmp_path):
    d = dt.datetime(2000, 1, 1)
    orders = spark.createDataFrame(
        [(1, 10, "O", 1.0, d, "1-URGENT"), (2, 10, "O", 1.0, d, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    # order 1: TWO late lines (must still count once); order 2: on time
    li = spark.createDataFrame(
        [
            (1, d + dt.timedelta(days=90)),
            (1, d + dt.timedelta(days=120)),
            (2, d + dt.timedelta(days=10)),
        ],
        "l_orderkey long, l_shipdate timestamp_ntz",
    )
    sf = str(tmp_path)
    orders.write.parquet(f"{sf}/orders.parquet")
    li.select(
        "l_orderkey",
        F.lit(1).alias("l_partkey"),
        F.lit(1).alias("l_suppkey"),
        F.lit(1).alias("l_linenumber"),
        F.lit(1.0).alias("l_quantity"),
        F.lit(1.0).alias("l_extendedprice"),
        F.lit(0.0).alias("l_discount"),
        F.lit(0.0).alias("l_tax"),
        F.lit("N").alias("l_returnflag"),
        F.lit("O").alias("l_linestatus"),
        "l_shipdate",
    ).write.parquet(f"{sf}/lineitem.parquet")
    out = entry.queries()["late_orders_by_priority"](spark, sf)
    got = {(r.o_orderpriority, r.n_late_orders) for r in out.collect()}
    assert got == {("1-URGENT", 1)}


def test_shipping_priority_schema_and_limit(spark):
    out = entry.queries()["shipping_priority"](spark, SF)
    rows = out.collect()
    assert len(rows) <= 10
    assert out.columns == ["l_orderkey", "revenue", "orderdate", "o_orderpriority"]
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_nation_market_share_bounds(spark):
    rows = entry.queries()["nation_market_share"](spark, SF).collect()
    assert rows, "expected one row per order year"
    for r in rows:
        assert 0.0 <= r.asia_share <= 1.0
        assert r.asia_revenue <= r.total_revenue


def test_market_share_broadcasts_dim_chain(spark):
    """supplier→nation→region must broadcast; the only shuffle join
    is the lineitem⋈orders fact join."""
    plan = plan_of(spark, "nation_market_share")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_session_assignment_matches_direct_sessionization(spark):
    """Range-join assignment must reproduce the window-derived
    session event counts exactly (spans are disjoint per user)."""
    assigned = entry.queries()["event_session_assignment"](spark, SF)
    total = assigned.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == n_events  # every event lands in exactly one span


def test_click_attribution_window_filter(spark):
    """Purchases with zero preceding clicks must appear with n=0."""
    out = entry.queries()["click_attribution"](spark, SF)
    e = spark.read.parquet(f"{SF}/events.parquet")
    n_purchases = e.filter(F.col("event_type") == "purchase").count()
    assert out.count() == n_purchases
    assert out.filter(F.col("n_clicks") == 0).count() >= 0  # schema sanity


def test_gapfill_spine_is_contiguous(spark):
    rows = entry.queries()["daily_sales_gapfilled"](spark, SF).collect()
    import datetime as _dt

    dates = sorted(_dt.date.fromisoformat(r.sale_date) for r in rows)
    assert (dates[-1] - dates[0]).days + 1 == len(dates)  # no holes, no dups
    gaps = [r for r in rows if r.was_gap]
    for g in gaps:
        assert g.total_sales == 0.0


def test_unpivot_roundtrips_wide_values(spark):
    out = entry.queries()["lineitem_metrics_unpivot"](spark, SF)
    rows = out.collect()
    flags = {r.l_returnflag for r in rows}
    assert all(
        len([r for r in rows if r.l_returnflag == f]) == 3 for f in flags
    )
    assert {r.metric for r in rows} == {"qty", "price", "n_lines"}


def test_dq_checks_clean_corpus_and_catches_orphans(spark, tmp_path):
    out = {r.check_name: r.n_violations for r in
           entry.queries()["dq_checks"](spark, SF).collect()}
    assert set(out) == {
        "orphan_lineitems", "orders_without_customer", "negative_prices",
        "discount_out_of_range", "ship_before_order",
    }
    # seeded corpus is referentially clean
    assert out["orphan_lineitems"] == 0
    assert out["orders_without_customer"] == 0
    # now break it: copy the tables, drop half the orders
    sf = str(tmp_path)
    o = spark.read.parquet(f"{SF}/orders.parquet")
    spark.read.parquet(f"{SF}/lineitem.parquet").write.parquet(
        f"{sf}/lineitem.parquet"
    )
    o.filter(F.col("o_orderkey") % 2 == 0).write.parquet(
        f"{sf}/orders.parquet"
    )
    spark.read.parquet(f"{SF}/customer.parquet").write.parquet(
        f"{sf}/customer.parquet"
    )
    broken = {r.check_name: r.n_violations for r in
              entry.queries()["dq_checks"](spark, sf).collect()}
    assert broken["orphan_lineitems"] > 0


def test_doc_length_deciles_partition_sizes(spark):
    rows = entry.queries()["doc_length_deciles"](spark, SF).collect()
    n = sum(r.n_docs for r in rows)
    assert len(rows) == 10
    sizes = [r.n_docs for r in sorted(rows, key=lambda r: r.decile)]
    assert max(sizes) - min(sizes) <= 1  # exact equal-frequency split
    assert n == spark.read.parquet(f"{SF}/documents.parquet").count()
    # deciles are ordered by token count
    ordered = sorted(rows, key=lambda r: r.decile)
    for a, b in zip(ordered, ordered[1:]):
        assert a.max_tokens <= b.min_tokens


def test_pricing_summary_single_pass_partial_agg(spark):
    """Q1 shape: one scan, partial+final HashAggregate, no join."""
    plan = plan_of(spark, "pricing_summary")
    assert plan.count("HashAggregate") >= 2
    assert "Join" not in plan


def test_grouping_sets_uses_expand(spark):
    plan = plan_of(spark, "revenue_grouping_sets")
    assert "Expand" in plan  # one pass, grains fanned by Expand
    rows = entry.queries()["revenue_grouping_sets"](spark, SF).collect()
    grand = [r for r in rows if r.grp_id == 3]
    assert len(grand) == 1 and grand[0].returnflag == "ALL"


def test_small_quantity_revenue_no_cartesian(spark):
    plan = plan_of(spark, "small_quantity_revenue")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q5_single_shuffle_join_broadcast_dims(spark):
    """Q5 shape: the only SortMergeJoin/shuffled join may be
    orders ⋈ lineitem; customer/supplier/nation/region all broadcast."""
    plan = plan_of(spark, "local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "CartesianProduct" not in plan


def test_q6_filters_reach_the_scan(spark):
    """Q6 shape: no join anywhere; shipdate/discount/quantity
    predicates are pushed to the parquet scan."""
    plan = plan_of(spark, "forecast_revenue_change")
    assert "Join" not in plan
    assert "PushedFilters" in plan
    for c in ("l_shipdate", "l_discount", "l_quantity"):
        assert c in plan.split("PushedFilters")[1][:400], c
