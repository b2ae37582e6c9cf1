"""Sequence packing: assemble documents into fixed token-budget
training sequences.

Two industry-standard strategies, in their scale-correct Spark
shapes:

- ``pack_concat`` — GPT-style concat-then-chunk: documents are laid
  end-to-end in a deterministic order and cut every ``budget``
  tokens; a document belongs to the pack its first token lands in.
  Pure window arithmetic (cumulative sum → floor-divide) — stays in
  whole-stage codegen, fully SQL-expressible, and the common choice
  when documents may straddle sequence boundaries.

- ``pack_greedy`` — first-fit-sequential bin packing: a document
  never straddles packs; a pack closes when the next document would
  overflow the budget. Inherently sequential state, which Spark's
  expression layer cannot express — implemented with
  ``applyInPandas`` per shard (category (b) of the custom-operator
  ladder). Oversized documents (> budget tokens) get a pack of their
  own, flagged ``truncate=true`` for the downstream tokenizer.

Both shard the corpus by a deterministic hash-free key
(``doc_id % n_shards``) and pack WITHIN shards. That is the 100 TB
design, not a local concession: a single global packing order would
serialize the whole corpus through one task, while per-shard packing
is embarrassingly parallel, loses at most one partially-filled pack
per shard, and keeps every shard's state bounded. Choose
``n_shards`` ~ corpus_tokens / (executor-memory-sized group); skew
is impossible because the shard key is uniform by construction.

Token counts use the whitespace tokenizer (``llm.text.token_count``)
so the DuckDB oracles reproduce counts exactly; swap in a real
tokenizer's counts upstream by passing a precomputed ``tokens_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pos_api_pipeline_spark.llm.text import token_count


def _with_shard_and_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokens_col: str | None,
    n_shards: int,
) -> DataFrame:
    n_tok = (
        F.col(tokens_col)
        if tokens_col
        else token_count(text_col)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    )


def pack_concat(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Concat-then-chunk packing. Within each shard, documents are
    ordered by id and laid end-to-end; ``pack_id`` is the chunk the
    document STARTS in (floor of the preceding-token count / budget)
    and ``start_offset`` its position inside that chunk.

    One shuffle (the per-shard window sort); everything else is
    arithmetic in codegen. Shards bound the sort size — no global
    order, no driver state."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    base = _with_shard_and_tokens(df, id_col, text_col, tokens_col, n_shards)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "shard",
        "doc_id",
        "n_tokens",
        F.floor(cum_before / budget).cast("long").alias("pack_id"),
        F.pmod(cum_before, F.lit(budget)).cast("long").alias("start_offset"),
    )


# Output schema of the greedy packer (applyInPandas contract).
_GREEDY_SCHEMA = (
    "shard long, doc_id long, n_tokens long, pack_id long, "
    "pack_fill long, truncate boolean"
)


def pack_greedy(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """First-fit-sequential packing: walk each shard's documents in
    id order; if the running pack would overflow ``budget``, close it
    and start the next. Documents never straddle packs; a document
    alone larger than the budget occupies its own pack with
    ``truncate=true``.

    The sequential scan state (current pack id + fill) lives in an
    Arrow-batched ``applyInPandas`` — one pass, O(shard) memory as a
    pandas frame. ``pack_fill`` reports the pack's fill AFTER this
    document, so the last row per (shard, pack_id) carries the pack's
    final token count for free."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    base = _with_shard_and_tokens(df, id_col, text_col, tokens_col, n_shards)

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        pack_ids, fills, truncs = [], [], []
        pack_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                pack_id += 1
                fill = 0
            fill += n
            pack_ids.append(pack_id)
            fills.append(fill)
            truncs.append(n > budget)
        return pd.DataFrame(
            {
                "shard": pdf["shard"],
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["n_tokens"],
                "pack_id": pack_ids,
                "pack_fill": fills,
                "truncate": truncs,
            }
        )

    return base.groupBy("shard").applyInPandas(pack, schema=_GREEDY_SCHEMA)


def packing_efficiency(packed: DataFrame, budget: int) -> DataFrame:
    """Per-shard packing diagnostics over ``pack_greedy`` output:
    pack count, mean fill fraction, and wasted-token fraction — the
    numbers that decide whether the budget/shard choice is right
    before a multi-day tokenization run."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("fill")
    )
    return per_pack.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_packs"),
        (F.avg("fill") / budget).alias("mean_fill_fraction"),
        (
            F.lit(1.0)
            - F.sum("fill") / (F.count(F.lit(1)) * F.lit(float(budget)))
        ).alias("waste_fraction"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split every document into fixed-size token windows with
    ``overlap`` tokens of context carried between consecutive chunks —
    the chunker in front of context-bounded training examples and RAG
    embedding indexes.

    Chunks start at stride ``chunk_tokens - overlap``: chunk i covers
    tokens [i*stride, i*stride + chunk_tokens). The final chunk may be
    short; a document shorter than one chunk yields exactly one chunk.
    Empty documents yield no rows.

    Map-only: tokenization, window arithmetic, and the slice explode
    all happen inside one projection per row — no shuffle, so at
    100 TB this pipelines with the scan and the downstream
    partitioned write. Output: (id_col, chunk_id, chunk_text,
    n_chunk_tokens, start_token).
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}"
        )
    from pos_api_pipeline_spark.llm.text import tokens

    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    df = df.withColumn("_toks", toks).withColumn("_n", F.size("_toks"))
    # Number of chunks: ceil((n - overlap) / stride) for n > 0, via
    # integer arithmetic; 0 for empty docs.
    df = df.withColumn(
        "_nc",
        F.when(
            F.col("_n") > 0,
            # ceil((n - overlap) / stride), floored at one chunk so a
            # document no longer than the overlap still chunks once.
            F.greatest(
                F.lit(1),
                (F.col("_n") - F.lit(overlap) + F.lit(stride) - 1)
                / F.lit(stride),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    # Guard the sequence: Spark's sequence(0, -1) runs BACKWARDS
    # ([0, -1]) instead of yielding an empty array, which would mint
    # phantom chunks for empty documents.
    chunk_structs = F.when(
        F.col("_nc") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("_nc") - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                (i * stride).cast("long").alias("start_token"),
                F.slice(F.col("_toks"), i * stride + 1, chunk_tokens).alias(
                    "_chunk"
                ),
            ),
        ),
    )
    ex = df.select(
        F.col(id_col), F.explode_outer(chunk_structs).alias("c")
    ).filter(F.col("c").isNotNull())
    return ex.select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.array_join(F.col("c._chunk"), " ").alias("chunk_text"),
        F.size(F.col("c._chunk")).cast("long").alias("n_chunk_tokens"),
        F.col("c.start_token").alias("start_token"),
    )
