"""Mega-star probe, EMBEDDING family: one LSH bucket with >=1M
DISTINCT vector-carrying members through the star-capped pair
enumerator (VERDICT r11 next-round #2).

BENCH_megastar_r11.json proved the cast-only capped-star fast path
on the simhash surface (string members) and *extrapolated* the
memory claim for the embedding family, where each member struct
carries the full dim-double vector — the regime where the pre-fix
windowed form's ceil(b/1024) members-array copies are widest
(1.2M members x 64 doubles ~ 600 MB per copy, ~1170 copies).
This probe MEASURES it: n_docs tiny deterministic perturbations of
one base vector (byte-distinct, so the collapse never merges them;
cosine ~ 1.0 and every hyperplane projection keeps the base's sign,
so ALL land in the same bucket of every OR-ed table), run through
the real detector surface (embedding_near_dup_pairs,
collapse_exact=False — what the auto-probe picks on an all-distinct
corpus — default 10k star cap) at the standard 16g driver heap.

Expected pairs: n_docs - 1 (star vs the lowest-id representative,
identical across the 3 OR-ed tables, deduped).

Usage: python tools/megastar_embedding_probe.py [repo_dir] [n_docs]
       [--collapsed]
Prints one JSON line: {n_docs, n_pairs, expect_pairs, seconds, repo}.
Run from BOTH checkouts (HEAD and .ab_worktrees/r10close pre-fix)
back-to-back for a same-phase comparison; pair counts must match
exactly at any size both complete.

``--collapsed`` probes the COLLAPSED arm's mega-bucket guard
instead: each of the n_docs distinct vectors gets one exact replica
(corpus = 2 x n_docs rows, n_docs distinct GROUPS in one bucket,
collapse_exact=True). Expected pairs: (n_docs - 1) star group pairs
expanded 2x2 plus n_docs within-family self pairs = 5*n_docs - 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

DIM = 64


def main() -> None:
    _args0 = [a for a in sys.argv[1:] if a != "--collapsed"]
    repo = _args0[0] if _args0 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    args = [a for a in sys.argv[1:] if a != "--collapsed"]
    n_docs = int(args[1]) if len(args) > 1 else 1_200_000
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from pos_api_pipeline_spark.llm.similarity import (
        embedding_near_dup_pairs,
    )
    from pos_api_pipeline_spark.session import get_spark

    spark = get_spark("megastar_embedding_probe")
    from pos_api_pipeline_spark.llm.similarity import _plane_sign

    # Base vector chosen so its projection on EVERY plane of the 3
    # OR-ed tables (18 plane indices at the defaults) is far from
    # zero: an all-ones base hits an exactly-zero +-1-plane sum with
    # prob C(64,32)/2^64 ~ 10% per plane, letting the 1e-6
    # perturbation decide the sign and split the mega-bucket (first
    # probe attempt measured exactly that: 16.2M pairs from sub-cap
    # buckets). base[d] = 1 + d/denom breaks the parity degeneracy;
    # scan denominators until min |proj| > 0.5 — then the total
    # perturbation (<= 64e-6) can never flip a sign, so ALL vectors
    # share one bucket per table by construction.
    n_planes, n_tables = 6, 3
    base = None
    for denom in range(97, 1097):
        cand = [1.0 + d / denom for d in range(DIM)]
        projs = [
            abs(
                sum(
                    _plane_sign(t * n_planes + p, d) * cand[d]
                    for d in range(DIM)
                )
            )
            for t in range(n_tables)
            for p in range(n_planes)
        ]
        if min(projs) > 0.5:
            base = cand
            break
    assert base is not None, "no sign-safe base found"
    # Per-(id, component) perturbation ~1e-6 * sin(...): keeps every
    # plane projection's sign and cosine-vs-base ~ 1 - O(1e-12),
    # while making every vector byte-distinct (sin of distinct
    # integer arguments) so the exact-dup collapse never merges them.
    collapsed = "--collapsed" in sys.argv[1:]
    vecs = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        F.zip_with(
            F.lit(base),
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda b, i: b
            + F.sin((F.col("id") * DIM + i).cast("double")) * 1e-6,
        ).alias("embedding"),
    )
    if collapsed:
        vecs = vecs.unionByName(
            vecs.select(
                (F.col("vec_id") + 100_000_000).alias("vec_id"),
                "embedding",
            )
        )
    t0 = time.perf_counter()
    n_pairs = embedding_near_dup_pairs(
        vecs, dim=DIM, threshold=0.95, collapse_exact=collapsed
    ).count()
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "what": (
                    "megastar single-bucket star-cap probe, "
                    "embedding family (vector-carrying members)"
                ),
                "n_docs": n_docs,
                "dim": DIM,
                "n_pairs": n_pairs,
                "expect_pairs": (5 * n_docs - 4) if collapsed else (n_docs - 1),
                "arm": "collapsed" if collapsed else "uncollapsed",
                "seconds": sec,
                "driver_memory": os.environ.get(
                    "SPARK_DRIVER_MEMORY", "16g"
                ),
                "repo": repo,
            }
        )
    )


if __name__ == "__main__":
    main()
