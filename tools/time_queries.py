"""Time individual registry queries in isolation with the noop sink.

Usage: python tools/time_queries.py [--runs N] [--sf SF_DIR] query ...

Per guide §1.4: each run times plan BUILD + noop execution (the bench
protocol — ``fn(spark, sf_dir)`` inside the timer), min/med/max over
``--runs`` (default 5). Jobs are labelled with setJobDescription. One
warm-up of the first query's table family absorbs JVM/codegen warmup.
Prints one JSON line per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    import __spark_entry__ as e
    from pos_api_pipeline_spark.session import get_spark

    spark = get_spark("time_queries")
    qs = e.queries()
    for warm in ("region_revenue", "token_stats", "ann_cosine_topk"):
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        fn = qs[name]
        ts = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {r}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(json.dumps({
            "query": name, "min": round(ts[0], 4),
            "med": round(ts[len(ts) // 2], 4), "max": round(ts[-1], 4),
            "runs": runs, "sf_dir": sf_dir,
        }))


if __name__ == "__main__":
    main()
