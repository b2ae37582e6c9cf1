"""Mega-star probe: one LSH bucket with >=1M members through the
star-capped pair enumerator (ROADMAP r10 residual #3 / VERDICT r10
item 4).

A star row over a b-member bucket emits only b-1 pairs (linear), but
the r10 PAIR_CHUNK windowing sliced its tail into ceil(b/1024)
generated rows, EACH carrying a copy of the full b-member members
array — O(b^2/1024) member copies. The r11 fix widens the per-row
window to the whole tail on capped rows (cast-only fast path: one
row, one members copy). This probe manufactures the regime no
driver SF reaches — 1.2M near-identical boilerplate docs landing in
one bucket — and runs the REAL detector surface (simhash_near_dups,
collapse_exact=False to keep doc grain, default max_bucket=10k star
cap) at the standard 16g driver heap.

Usage: python tools/megastar_probe.py [repo_dir] [n_docs]
Prints one JSON line: {n_docs, n_pairs, seconds, repo}.
Run it from BOTH checkouts (pre/post fix) back-to-back for a
same-phase comparison; pair counts must match exactly.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
    sys.path.insert(0, repo)
    from pyspark.sql import functions as F

    from pos_api_pipeline_spark.llm import dedup as D
    from pos_api_pipeline_spark.session import get_spark

    spark = get_spark("megastar_probe")
    # Identical boilerplate text in every doc: every signature (and
    # every simhash block) is equal, so ALL docs land in the same
    # bucket in each of the 4 block tables -> a single star bucket of
    # n_docs members per block. collapse_exact=False keeps doc grain
    # (the uncollapsed path is what the auto-switch picks on low-dup
    # corpora; boilerplate floods are exactly how this regime shows
    # up there).
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "standard boilerplate footer text repeated across the "
            "entire crawl corpus with no variation at all"
        ).alias("text"),
    )
    t0 = time.perf_counter()
    n_pairs = D.simhash_near_dups(
        docs, collapse_exact=False
    ).count()
    sec = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "what": "megastar single-bucket star-cap probe",
                "n_docs": n_docs,
                "n_pairs": n_pairs,
                "expect_pairs": n_docs - 1,
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
