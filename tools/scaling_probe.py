"""Core-scaling evidence: time queries at N cores vs M cores, interleaved.

Usage: python tools/scaling_probe.py SF_DIR CORES_A CORES_B [--reps 2]
       [--runs 2] q1 [q2 ...]

Runs tools/time_queries.py in a fresh subprocess per (pass, cores)
with SPARK_GRAFT_CPUS set, interleaving A,B,A,B so both core counts
sample the same host phase. Prints one JSON object: per-query min
seconds per core count plus the B/A ratio (ratio ≫ 1 with A>B cores
= data-bound parallelism; ≈ 1 = overhead-bound at this SF).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pass(sf_dir: str, cores: str, runs: int, names: list) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=cores)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "time_queries.py"),
         "--runs", str(runs), "--sf", sf_dir, *names],
        capture_output=True, text=True, env=env, timeout=7200, cwd=REPO,
    )
    out = {}
    for line in proc.stdout.splitlines():
        try:
            d = json.loads(line)
        except ValueError:
            continue
        if "query" in d and "min" in d:
            out[d["query"]] = d["min"]
    if len(out) != len(names):
        raise RuntimeError(
            f"pass cores={cores} returned {len(out)}/{len(names)}:\n"
            f"{proc.stdout[-1500:]}\n{proc.stderr[-1500:]}"
        )
    return out


def main() -> None:
    args = sys.argv[1:]
    reps, runs = 2, 2
    pos = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            pos.append(args[i]); i += 1
    sf_dir, cores_a, cores_b, names = pos[0], pos[1], pos[2], pos[3:]
    passes: dict[str, list[dict]] = {cores_a: [], cores_b: []}
    for rep in range(reps):
        for cores in (cores_a, cores_b):
            res = _pass(sf_dir, cores, runs, names)
            passes[cores].append(res)
            print(f"# rep {rep + 1} cores={cores}: {json.dumps(res)}",
                  file=sys.stderr)
    mins = {
        c: {q: min(p[q] for p in ps) for q in names}
        for c, ps in passes.items()
    }
    print(json.dumps({
        "what": (
            f"interleaved core-scaling probe (fresh subprocess per pass, "
            f"min-of-{runs} per query per pass, {reps} passes per core "
            f"count, SPARK_GRAFT_CPUS honored by session.get_spark)"
        ),
        "sf_dir": sf_dir,
        "cores": {"a": cores_a, "b": cores_b},
        "min_sec": mins,
        "ratio_b_over_a": {
            q: round(mins[cores_b][q] / mins[cores_a][q], 4)
            for q in names if mins[cores_a][q] > 0
        },
        "passes": passes,
    }))


if __name__ == "__main__":
    main()
