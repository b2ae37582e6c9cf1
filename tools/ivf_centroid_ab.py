"""A/B IVF's default first-N-by-id centroids vs KMeans-trained
centroids at sf1 (VERDICT r11 next-round #6).

The default (``deterministic_centroids``) is a fixed heuristic chosen
for oracle reproducibility (a SQL twin can replay first-N-by-id; a
KMeans fit cannot). The KMeans variant exists
(``kmeans_centroids``, seed-pinned) and is recall-tracked per round
via ``ivf_trained_recall_at_k``. This measures what the heuristic
actually costs on both sf1 corpora:

- recall@10 vs exact brute-force truth (20 query vectors, the
  ``ivf_recall_at_k`` protocol) on the 10-way-replica sf1 embeddings
  AND the all-distinct perturbed twin (sf1p),
- wall time split into centroid construction (the fit cost the
  default avoids) and query execution, interleaved A/B sides
  (min-of-3) so a host phase shift hits both sides equally,
- at the tracked n_centroids=16 and at the auto-scaled cell count
  (``centroids_for_corpus``), since a fixed 16 is not the 100 TB
  shape.

Writes BENCH_ivf_centroid_ab_sf1_r12.json.

Usage: python tools/ivf_centroid_ab.py [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_api_pipeline_spark.llm import similarity as S  # noqa: E402
from pos_api_pipeline_spark.session import get_spark, read_parquet  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = 10
N_QUERIES = 20
N_PROBE = 4


def _recall(emb, qs, cents, n_centroids):
    exact = S.brute_force_topk(emb, qs, k=K).select(
        "query_id", "neighbor_id"
    )
    approx = (
        S.ivf_topk(
            emb, qs, dim=64, k=K,
            n_centroids=n_centroids, n_probe=N_PROBE, centroids=cents,
        )
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    row = (
        exact.join(approx, on=["query_id", "neighbor_id"], how="left")
        .agg(
            (F.sum(F.coalesce("hit", F.lit(0))) / F.count(F.lit(1))).alias("r"),
            F.count(F.lit(1)).alias("n"),
        )
        .head()
    )
    return float(row["r"]), int(row["n"])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_ivf_centroid_ab_sf1_r12.json"
    )
    spark = get_spark("ivf-centroid-ab")
    corpora = {
        "sf1_replica": os.path.join(REPO, "scale_data/sf1/embeddings.parquet"),
        "sf1p_distinct": os.path.join(REPO, "scale_data/sf1p/embeddings.parquet"),
    }
    results = {}
    for cname, path in corpora.items():
        emb = read_parquet(spark, path)
        n = emb.count()
        # TWO query sets: the registry protocol's vec_id < 20 (which
        # OVERLAPS the first-N-by-id centroid set — inherently
        # favorable to the default, since a query that IS a centroid
        # routes to its own cell), and a disjoint mid-id slice that
        # removes that bias.
        # The disjoint ids must exist in the corpus (scale_up's
        # key-shifted replica ids are sparse — a literal mid-range
        # guess selects nothing and an empty query set crashed the
        # first run of this tool): take the 101st..120th smallest
        # actual ids, far above any plausible first-N centroid set.
        mid_ids = [
            r.vec_id
            for r in emb.select("vec_id")
            .orderBy("vec_id")
            .limit(100 + N_QUERIES)
            .collect()[-N_QUERIES:]
        ]
        query_sets = {
            "overlap_first20": emb.filter(F.col("vec_id") < N_QUERIES),
            "disjoint_mid": emb.filter(F.col("vec_id").isin(mid_ids)),
        }
        for qname, qs in query_sets.items():
          for n_cent in (16, S.centroids_for_corpus(n)):
            rec = {}
            # Interleaved min-of-3: default, trained, default, ...
            for _ in range(3):
                for side in ("default_first_n", "kmeans_trained"):
                    t0 = time.perf_counter()
                    if side == "default_first_n":
                        cents = S.deterministic_centroids(emb, n_cent)
                        cents.count()  # materialize the model state
                    else:
                        cents = S.kmeans_centroids(emb, n_centroids=n_cent)
                    fit_s = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    recall, n_truth = _recall(emb, qs, cents, n_cent)
                    query_s = time.perf_counter() - t0
                    cents.unpersist() if hasattr(cents, "unpersist") else None
                    r = rec.setdefault(
                        side,
                        {"fit_seconds": [], "query_seconds": [],
                         "recall_at_10": recall, "n_truth_pairs": n_truth},
                    )
                    r["fit_seconds"].append(round(fit_s, 3))
                    r["query_seconds"].append(round(query_s, 3))
            for side, r in rec.items():
                r["fit_seconds_min"] = min(r["fit_seconds"])
                r["query_seconds_min"] = min(r["query_seconds"])
            results[f"{cname}:{qname}:n_centroids={n_cent}"] = {
                "n_vectors": n,
                **{f"{s}": r for s, r in rec.items()},
                "recall_delta_trained_minus_default": round(
                    rec["kmeans_trained"]["recall_at_10"]
                    - rec["default_first_n"]["recall_at_10"],
                    4,
                ),
            }
            print(cname, qname, n_cent, json.dumps(results[f"{cname}:{qname}:n_centroids={n_cent}"]))

    payload = {
        "metric": "ivf_centroid_default_ab",
        "protocol": (
            f"recall@{K} vs brute-force truth over {N_QUERIES} query "
            f"vectors, n_probe={N_PROBE}, interleaved min-of-3 sides"
        ),
        "corpora": results,
    }
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=2)
    print(json.dumps({"out": out_path}))


if __name__ == "__main__":
    main()
