"""Property-based tests (hypothesis) for operator invariants.

Each property generates a batch of rows and runs ONE Spark job over
the whole batch — examples are rows, not jobs, so the suite stays
fast. max_examples is deliberately small; the row batches carry the
variety.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pos_api_pipeline_spark.operators.transform import (
    homogenize_order_types,
    with_time_slots,
)
from pos_api_pipeline_spark.operators.windows import window_dedup
from pos_api_pipeline_spark.schemas import CURATED_COLUMNS, conform

SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

order_text = st.text(
    alphabet="abcdMesa01- Llevardomicilio", min_size=0, max_size=20
)


@given(st.lists(order_text, min_size=1, max_size=30))
@settings(**SETTINGS)
def test_homogenize_idempotent_and_closed(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "order_type string")
    once = [r.order_type for r in homogenize_order_types(df).collect()]
    df2 = spark.createDataFrame([(v,) for v in once], "order_type string")
    twice = [r.order_type for r in homogenize_order_types(df2).collect()]
    # Idempotent: a second pass never changes anything (every rule's
    # output is a fixed point of the rule chain).
    assert once == twice
    # Closed: outputs are either canonical values or untouched inputs.
    canon = {"Para llevar", "Mesa 2", "A domicilio"}
    for inp, out in zip(values, once):
        assert out in canon or out == inp


@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(2020, 1, 1), max_value=dt.datetime(2030, 1, 1)
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_time_slots_invariants(spark, stamps):
    stamps = [s.replace(microsecond=0) for s in stamps]
    df = spark.createDataFrame([(s,) for s in stamps], "datetime timestamp")
    rows = with_time_slots(df).collect()
    for r in rows:
        assert 0 <= r.minutes_past_midnight <= 1439
        h = r.shifted_time.hour
        assert r.time_slot == f"{h:02d}:00-{h + 1:02d}:00"
        # Fixed −6 h arithmetic, no tz rules.
        assert (r.datetime - r.shifted_time) == dt.timedelta(hours=6)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),  # receipt key space (forces collisions)
            st.integers(0, 2),  # item key space
            st.integers(0, 1000),  # order value
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_window_dedup_invariants(spark, rows):
    df = spark.createDataFrame(
        [
            (f"r{a}", f"i{b}", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=c), c)
            for a, b, c in rows
        ],
        "receipt_number string, item_name string, shifted_time timestamp, v long",
    )
    out = window_dedup(df).collect()
    keys = {(f"r{a}", f"i{b}") for a, b, _ in rows}
    # Exactly one survivor per key…
    assert len(out) == len(keys)
    # …and it's the latest (max minute value) for that key.
    expect = {}
    for a, b, c in rows:
        k = (f"r{a}", f"i{b}")
        expect[k] = max(expect.get(k, -1), c)
    for r in out:
        assert r.v == expect[(r.receipt_number, r.item_name)]


@given(
    st.lists(
        st.sampled_from(
            ["receipt_number", "price", "unknown_col", "item_name", "cost"]
        ),
        min_size=0,
        max_size=4,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_conform_always_yields_contract_schema(spark, cols):
    if cols:
        row = tuple("1" for _ in cols)
        df = spark.createDataFrame([row], ", ".join(f"{c} string" for c in cols))
    else:
        df = spark.range(1)
    out = conform(df)
    assert out.columns == CURATED_COLUMNS
    out.collect()  # materializes: all casts valid
