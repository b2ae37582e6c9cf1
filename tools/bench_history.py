"""Per-query benchmark history across rounds.

Reads every BENCH_r*.json in the repo root, lines up per-query
timings, and flags queries whose latest time regressed more than
``threshold``× against their best prior round. Complements
PLAN_SNAPSHOT.json: the snapshot catches structural plan regressions,
this catches same-plan slowdowns (data growth, cache loss, constant
churn). min-of-3 timings still carry host noise — treat a flag as
"look", not "revert".

Usage: python tools/bench_history.py [threshold=2.0]
"""

from __future__ import annotations

import glob
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds(pattern: str = "BENCH_r*.json") -> dict[str, dict[str, float]]:
    rounds: dict[str, dict[str, float]] = {}
    # Anchor to the repo root so the tool works from any cwd.
    for path in sorted(glob.glob(os.path.join(_ROOT, pattern))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        # Driver files wrap the bench line under "parsed"; local runs
        # are the bare line.
        if isinstance(data.get("parsed"), dict):
            data = data["parsed"]
        queries = data.get("queries")
        if isinstance(queries, dict) and queries:
            tag = path.split("BENCH_")[1].split(".json")[0]
            rounds[tag] = {k: float(v) for k, v in queries.items()}
    return rounds


def main() -> int:
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    rounds = load_rounds()
    if len(rounds) < 2:
        print(f"{len(rounds)} usable BENCH round(s) — need 2+ to compare")
        return 0
    tags = sorted(rounds)
    latest = tags[-1]
    flags = []
    rows = []
    for q, t_now in sorted(rounds[latest].items()):
        prior = [rounds[t][q] for t in tags[:-1] if q in rounds[t]]
        if not prior:
            rows.append((q, t_now, None, "new"))
            continue
        best = min(prior)
        ratio = t_now / best if best > 0 else float("inf")
        note = ""
        if ratio > threshold and t_now - best > 0.5:
            note = f"REGRESSED {ratio:.1f}x vs best prior {best:.2f}s"
            flags.append((q, ratio))
        rows.append((q, t_now, best, note))
    print(f"rounds: {', '.join(tags)}; latest={latest}; "
          f"threshold={threshold}x (+0.5s absolute)")
    for q, now, best, note in rows:
        if note:
            b = f"{best:.2f}" if best is not None else "-"
            print(f"  {q}: {now:.2f}s (best prior {b}s) {note}")
    totals = {t: sum(rounds[t].values()) for t in tags}
    print("totals: " + ", ".join(f"{t}={v:.1f}s" for t, v in totals.items()))
    if flags:
        print(f"{len(flags)} per-query regression(s) flagged")
    else:
        print("no per-query regressions flagged")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
