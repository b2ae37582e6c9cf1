"""End-to-end training-set materialization units."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    rows = []
    for i in range(40):
        # stopword-bearing filler so the Gopher probe passes; unique
        # tail so near-dup pruning doesn't collapse everything.
        body = f"the data and value of run {i} " + " ".join(
            f"tok{i}x{j}" for j in range(12)
        )
        rows.append((i, body))
    rows.append((100, rows[0][1]))           # exact dup of doc 0
    rows.append((101, "tiny"))               # fails min_words
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_filters_dedups_and_respects_budget(spark):
    from pos_api_pipeline_spark.llm.pipeline import curate

    out = curate(_docs(spark), budget_tokens=300).collect()
    ids = {r.doc_id for r in out}
    assert 101 not in ids                   # rule-filtered
    assert 100 not in ids and 0 in ids      # exact dup dropped, low id kept
    assert sum(r.n_words for r in out) <= 300
    assert all(r.n_words > 0 for r in out)


def test_materialize_training_set_layout_and_stats(spark, tmp_path):
    from pos_api_pipeline_spark.llm.pipeline import (
        materialize_training_set,
        training_set_stats,
    )

    out_dir = str(tmp_path / "train")
    mat = materialize_training_set(
        _docs(spark), out_dir, budget_tokens=700, seq_budget=64, n_shards=4
    )
    rows = mat.collect()
    assert rows and set(mat.columns) >= {
        "doc_id", "text", "n_tokens", "pack_id", "start_offset", "shard"
    }
    # partitioned layout on disk, one dir per non-empty shard
    import os

    shards = {d for d in os.listdir(out_dir) if d.startswith("shard=")}
    assert shards == {f"shard={r.shard}" for r in rows}
    # packing coordinates: offsets live inside the sequence budget
    assert all(0 <= r.start_offset < 64 for r in rows)
    stats = training_set_stats(mat).collect()
    assert sum(s.n_docs for s in stats) == len(rows)
    # rerun is idempotent (dynamic overwrite, hash shards)
    mat2 = materialize_training_set(
        _docs(spark), out_dir, budget_tokens=700, seq_budget=64, n_shards=4
    )
    assert sorted((r.doc_id, r.shard, r.pack_id) for r in mat2.collect()) == \
           sorted((r.doc_id, r.shard, r.pack_id) for r in rows)
