"""Units for llm/packing.py: concat-chunk and greedy first-fit
sequence packing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark.llm.packing import (
    pack_concat,
    pack_greedy,
    packing_efficiency,
)


def _docs(spark, token_counts, n_shards_hint=1):
    """One shard (doc_id 0..n-1 with n_shards=1) with the given
    per-doc token counts, provided via tokens_col."""
    rows = [(i, n) for i, n in enumerate(token_counts)]
    return spark.createDataFrame(rows, "doc_id long, n_tok long")


def test_pack_concat_hand_computed(spark):
    # Budget 10; docs of 4, 5, 3, 9 laid end-to-end:
    # starts at 0, 4, 9, 12 → packs 0, 0, 0, 1; offsets 0, 4, 9, 2.
    df = _docs(spark, [4, 5, 3, 9])
    out = {
        r.doc_id: r
        for r in pack_concat(
            df, 10, tokens_col="n_tok", n_shards=1
        ).collect()
    }
    assert [out[i].pack_id for i in range(4)] == [0, 0, 0, 1]
    assert [out[i].start_offset for i in range(4)] == [0, 4, 9, 2]


def test_pack_greedy_hand_computed(spark):
    # Budget 10; greedy: [4,5] fill 9; 3 would overflow → pack 1:
    # [3] fill 3; 9 overflows → pack 2: [9].
    df = _docs(spark, [4, 5, 3, 9])
    out = {
        r.doc_id: r
        for r in pack_greedy(
            df, 10, tokens_col="n_tok", n_shards=1
        ).collect()
    }
    assert [out[i].pack_id for i in range(4)] == [0, 0, 1, 2]
    assert [out[i].pack_fill for i in range(4)] == [4, 9, 3, 9]
    assert not any(out[i].truncate for i in range(4))


def test_pack_greedy_oversized_doc_flagged(spark):
    # Budget 10; a 25-token doc gets its own pack, truncate=true,
    # and the stream continues correctly after it.
    df = _docs(spark, [8, 25, 4])
    out = {
        r.doc_id: r
        for r in pack_greedy(
            df, 10, tokens_col="n_tok", n_shards=1
        ).collect()
    }
    assert [out[i].pack_id for i in range(3)] == [0, 1, 2]
    assert out[1].truncate and not out[0].truncate and not out[2].truncate
    assert out[1].pack_fill == 25


def test_pack_greedy_never_straddles_and_fills_bound(spark):
    df = _docs(spark, [3, 3, 3, 3, 3, 3, 3])
    rows = pack_greedy(df, 10, tokens_col="n_tok", n_shards=1).collect()
    per_pack = {}
    for r in rows:
        per_pack.setdefault(r.pack_id, 0)
        per_pack[r.pack_id] += r.n_tokens
    # 3+3+3=9 fits, fourth 3 overflows → packs of 3 docs each.
    assert all(v <= 10 for v in per_pack.values())
    assert per_pack == {0: 9, 1: 9, 2: 3}


def test_packing_efficiency_hand_computed(spark):
    df = _docs(spark, [4, 5, 3, 9])
    packed = pack_greedy(df, 10, tokens_col="n_tok", n_shards=1)
    eff = packing_efficiency(packed, 10).collect()[0]
    # Packs: fill 9, 3, 9 → mean fill 0.7, waste 1 - 21/30 = 0.3.
    assert eff.n_packs == 3
    assert abs(eff.mean_fill_fraction - 0.7) < 1e-12
    assert abs(eff.waste_fraction - 0.3) < 1e-12


def test_sharding_partitions_work(spark):
    df = spark.createDataFrame(
        [(i, 5) for i in range(40)], "doc_id long, n_tok long"
    )
    out = pack_concat(df, 10, tokens_col="n_tok", n_shards=4)
    shards = {r.shard for r in out.collect()}
    assert shards == {0, 1, 2, 3}
    # Pack ids restart per shard (10 docs x 5 tokens / 10 budget = 5
    # packs per shard, ids 0..4).
    max_pack = out.agg(F.max("pack_id")).collect()[0][0]
    assert max_pack == 4


def test_budget_validation(spark):
    df = _docs(spark, [1])
    with pytest.raises(ValueError):
        pack_concat(df, 0, tokens_col="n_tok")
    with pytest.raises(ValueError):
        pack_greedy(df, -5, tokens_col="n_tok")


def test_chunk_documents_overlap_and_edges(spark):
    from pos_api_pipeline_spark.llm.packing import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),  # 10 tokens
            (1, "a b c"),  # shorter than one chunk
            (2, ""),  # empty -> no rows
            (3, "x y z w"),  # n == overlap boundary
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=4)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.chunk_text, r.n_chunk_tokens, r.start_token)
         for r in out.collect())
    )
    assert rows == [
        (0, 0, "t0 t1 t2 t3 t4 t5 t6 t7", 8, 0),
        (0, 1, "t4 t5 t6 t7 t8 t9", 6, 4),
        (1, 0, "a b c", 3, 0),
        (3, 0, "x y z w", 4, 0),
    ]
    # Consecutive chunks share exactly `overlap` tokens.
    assert rows[0][2].split()[4:] == rows[1][2].split()[:4]


def test_chunk_documents_validates_params(spark):
    import pytest

    from pos_api_pipeline_spark.llm.packing import chunk_documents

    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
