"""Same-phase A/B of named registry queries across two checkouts.

This host has multi-hour degraded phases (ROADMAP r10: the same
binary measured 56.5 s and 196.3 s two hours apart), so only
back-to-back, INTERLEAVED measurements are attributable to code.
This tool interleaves full passes A,B,A,B,... (each pass a fresh
subprocess with its own SparkSession, warmed up, min-of-``--runs``
per query via the noop sink) and stamps a trivial-query phase canary
inside every pass, so the artifact itself shows whether the phase
held across the comparison.

Usage:
    python tools/ab_compare.py REPO_A REPO_B SF_DIR q1 [q2 ...] \
        [--reps 3] [--runs 3] [--label-a HEAD --label-b base]

Prints one JSON object: per-side per-query min-over-reps (plus
per-rep values), per-pass canary ratios, and the A/B ratio per query.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

CANARY = ("event_type_pivot", "props_k_buckets", "order_status_cube")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
sf_dir, runs = sys.argv[2], int(sys.argv[3])
names = json.loads(sys.argv[4])
import __spark_entry__ as e
from pos_api_pipeline_spark.session import get_spark
spark = get_spark("ab_compare")
qs = e.queries()
for warm in ("region_revenue", "token_stats", "ann_cosine_topk"):
    try:
        qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception:
        pass
out = {}
for name in names:
    vals = []
    for _ in range(runs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        vals.append(time.perf_counter() - t0)
    out[name] = round(min(vals), 4)
print("AB_RESULT " + json.dumps(out))
"""


def _run_pass(repo: str, sf_dir: str, runs: int, names: list) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, repo, sf_dir, str(runs),
         json.dumps(names)],
        capture_output=True, text=True, cwd=repo, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"pass in {repo} produced no result:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("repo_a")
    ap.add_argument("repo_b")
    ap.add_argument("sf_dir")
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--label-a", default="A")
    ap.add_argument("--label-b", default="B")
    args = ap.parse_args()

    names = list(args.queries) + [c for c in CANARY
                                  if c not in args.queries]
    passes: dict[str, list[dict]] = {"a": [], "b": []}
    for rep in range(args.reps):
        for side, repo in (("a", args.repo_a), ("b", args.repo_b)):
            res = _run_pass(repo, args.sf_dir, args.runs, names)
            passes[side].append(res)
            print(
                f"# rep {rep + 1} {side}={repo}: "
                + json.dumps(res), file=sys.stderr,
            )

    def agg(side):
        return {
            q: {
                "min": min(p[q] for p in passes[side]),
                "reps": [p[q] for p in passes[side]],
            }
            for q in names
        }

    a, b = agg("a"), agg("b")
    out = {
        "what": (
            "interleaved same-phase A/B (fresh subprocess per pass, "
            f"min-of-{args.runs} per query per pass, "
            f"{args.reps} passes per side)"
        ),
        "sf_dir": args.sf_dir,
        "labels": {"a": args.label_a, "b": args.label_b},
        "repos": {"a": args.repo_a, "b": args.repo_b},
        "a": a,
        "b": b,
        "ratio_a_over_b": {
            q: round(a[q]["min"] / b[q]["min"], 4)
            for q in args.queries if b[q]["min"] > 0
        },
        "canary": {
            q: {"a_min": a[q]["min"], "b_min": b[q]["min"]}
            for q in CANARY if q in a
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
