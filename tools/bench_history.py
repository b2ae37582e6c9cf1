"""Per-query benchmark history across rounds.

Reads every BENCH_r*.json in the repo root (driver records — often
truncated past round 1) plus BENCH_HISTORY.jsonl (full lines appended
by bench.py itself), lines up per-query timings, and flags:

- queries whose latest time regressed more than ``threshold``× (and
  >0.5 s absolute) against their best prior round;
- queries that VANISHED from the latest round (present before, absent
  now — a hard regression masquerading as nothing);
- queries the latest round recorded in its ``errors`` map.

Complements PLAN_SNAPSHOT.json: the snapshot catches structural plan
regressions, this catches same-plan slowdowns (data growth, cache
loss, constant churn). min-of-3 timings still carry host noise —
treat a flag as "look", not "revert".

Usage: python tools/bench_history.py [threshold] [--md out.md]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from datetime import datetime, timezone

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

Round = dict  # {"queries": {q: sec}, "errors": {q: msg}, "sf": ...}


_TREND_SF = 0.1  # the driver's bench SF — trends only compare like-for-like


def load_rounds() -> dict[str, Round]:
    """Tag → round record, insertion-ordered oldest→latest.

    Ordering NEVER uses tag strings (any 'run-*' would outrank every
    driver 'rNN' lexicographically) or file mtimes (a fresh git clone
    resets them to checkout time, which would misrank old driver
    records above newer jsonl runs). Instead: a driver record whose
    total matches a jsonl line IS that run (the driver invokes
    bench.py, which appends the line) and adopts its embedded ``ts``
    — the jsonl twin is dropped. Unmatched driver records predate the
    jsonl file (or were truncated rounds) and sort FIRST, in round
    order. Both sources are filtered to the driver SF so an sf0.01
    local run can never be trended against sf0.1 rounds.
    """
    jsonl_lines: list[dict] = []
    jsonl = os.path.join(_ROOT, "BENCH_HISTORY.jsonl")
    if os.path.exists(jsonl):
        with open(jsonl) as f:
            for line in f:
                try:
                    data = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if not (isinstance(data.get("queries"), dict)
                        and data["queries"]):
                    continue
                if data.get("sf") != _TREND_SF:
                    continue
                jsonl_lines.append(data)
    ts_by_total = {
        round(float(d["value"]), 4): float(d.get("ts") or 0)
        for d in jsonl_lines
        if isinstance(d.get("value"), (int, float))
    }
    # run_id (bench.py emits one per run since r5) is the exact
    # match; rounded-total is the legacy fallback for records that
    # predate it — two runs with identical rounded totals would
    # otherwise adopt each other's timestamps.
    ts_by_run_id = {
        d["run_id"]: float(d.get("ts") or 0)
        for d in jsonl_lines
        if d.get("run_id")
    }

    # Pass 1: read every usable driver record with its jsonl match.
    driver: list[tuple[str, float | None, Round]] = []  # (tag, ts?, rec)
    matched_totals: set[float] = set()
    matched_run_ids: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_ROOT, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        parsed = data.get("parsed")
        if isinstance(parsed, dict):
            data = parsed
        queries = data.get("queries")
        if not (isinstance(queries, dict) and queries):
            continue
        if data.get("sf") not in (None, _TREND_SF):
            continue
        tag = path.split("BENCH_")[1].split(".json")[0]
        rec: Round = {
            "queries": {k: float(v) for k, v in queries.items()},
            "errors": data.get("errors") or {},
            "sf": data.get("sf"),
            "phase": (
                data.get("phase_ratio_start"),
                data.get("phase_ratio_end"),
            ),
            # r12 methodology flag: entries without it timed the
            # canary cold (start ratios 1.5-2.6 on a quiet host are
            # warm-up, not phase) — segment before comparing.
            "canary_warmed": bool(data.get("canary_warmed")),
        }
        total = data.get("value")
        key = (
            round(float(total), 4)
            if isinstance(total, (int, float))
            else None
        )
        ts: float | None = None
        rid = data.get("run_id")
        if rid and rid in ts_by_run_id:
            matched_run_ids.add(rid)
            ts = ts_by_run_id[rid] or None
        elif key is not None and key in ts_by_total:
            # legacy (pre-run_id) twin: dedup by rounded total even
            # when its ts is 0/missing
            matched_totals.add(key)
            ts = ts_by_total[key] or None
        driver.append((tag, ts, rec))

    # Pass 2: place unmatched driver rounds. Driver round numbers are
    # monotone in time, so an unmatched round BEFORE the last matched
    # one predates the jsonl file (sorts first, in file order) and an
    # unmatched round AFTER it is newer than the whole jsonl history
    # (its bench append failed — sorts last, not first).
    max_ts = max([ts for ts in ts_by_total.values() if ts] or [0.0])
    last_matched_idx = max(
        (i for i, (_, ts, _) in enumerate(driver) if ts is not None),
        default=-1,
    )
    timed: list[tuple[float, str, Round]] = []
    for i, (tag, ts, rec) in enumerate(driver):
        if ts is not None:
            timed.append((ts, tag, rec))
        elif i > last_matched_idx and last_matched_idx >= 0:
            timed.append((max_ts + 1.0 + i, tag, rec))
        else:
            timed.append((float(i), tag, rec))
    for data in jsonl_lines:
        if data.get("run_id") and data["run_id"] in matched_run_ids:
            continue  # same run as a driver record (tagged above)
        total = data.get("value")
        if (
            isinstance(total, (int, float))
            and round(float(total), 4) in matched_totals
        ):
            continue  # same run as a driver record (tagged above)
        ts = float(data.get("ts") or 0)
        when = (
            datetime.fromtimestamp(ts, tz=timezone.utc).strftime(
                "%Y%m%dT%H%M%S"
            )
            if ts
            else "unknown"
        )
        timed.append(
            (
                ts,
                f"run-{when}",
                {
                    "queries": {k: float(v) for k, v in data["queries"].items()},
                    "errors": data.get("errors") or {},
                    "sf": data.get("sf"),
                    "phase": (
                        data.get("phase_ratio_start"),
                        data.get("phase_ratio_end"),
                    ),
                    "canary_warmed": bool(data.get("canary_warmed")),
                },
            )
        )
    timed.sort(key=lambda t: t[0])
    return {tag: rec for _, tag, rec in timed}


def analyze(rounds: dict[str, Round], threshold: float):
    tags = list(rounds)  # insertion order = real-time order
    latest = tags[-1]
    latest_q = rounds[latest]["queries"]
    flags: list[tuple[str, str]] = []
    rows: list[tuple[str, float, float | None, str]] = []
    for q, t_now in sorted(latest_q.items()):
        prior = [
            rounds[t]["queries"][q]
            for t in tags[:-1]
            if q in rounds[t]["queries"]
        ]
        if not prior:
            rows.append((q, t_now, None, "new"))
            continue
        best = min(prior)
        ratio = t_now / best if best > 0 else float("inf")
        note = ""
        if ratio > threshold and t_now - best > 0.5:
            note = f"REGRESSED {ratio:.1f}x vs best prior {best:.2f}s"
            flags.append((q, note))
        rows.append((q, t_now, best, note))
    # Hard regressions: queries the PREVIOUS round had that the
    # latest silently lost (renames show as new+vanished). Scoped to
    # the previous round only — a deliberately removed query flags
    # once and clears next round, instead of wedging every future run
    # against the union of all history.
    seen_before = (
        set(rounds[tags[-2]]["queries"]) if len(tags) > 1 else set()
    )
    vanished = sorted(seen_before - set(latest_q))
    for q in vanished:
        flags.append((q, "VANISHED from latest round"))
    errors = rounds[latest].get("errors") or {}
    for q, msg in sorted(errors.items()):
        flags.append((q, f"ERRORED: {msg[:120]}"))
    return tags, latest, rows, vanished, errors, flags


def write_md(path, tags, latest, rounds, rows, vanished, errors, flags):
    lines = [
        "# Bench history (per query, seconds, min-of-3 at sf0.1)",
        "",
        f"Rounds compared: {', '.join(tags)} — latest: **{latest}**.",
        "Driver BENCH_r{N}.json records are truncated past r1; full",
        "lines come from BENCH_HISTORY.jsonl (written by bench.py).",
        "",
    ]
    def _phase_note(t):
        # Host-phase canary ratio (start/end vs pins), stamped by
        # bench.py since r11: ~1.0 = quiet machine, higher = degraded
        # phase — a total without its phase is not interpretable on
        # this host.
        ph = rounds[t].get("phase") or (None, None)
        if ph[0] is None and ph[1] is None:
            return ""
        fmt = lambda v: "?" if v is None else f"{v:.2f}"  # noqa: E731
        # "cold" marks pre-r12 entries whose start ratio includes JVM
        # warm-up (canary not warmed) — not comparable to warmed ones.
        cold = "" if rounds[t].get("canary_warmed") else " cold-canary"
        return f" (phase {fmt(ph[0])}/{fmt(ph[1])}{cold})"

    totals = ", ".join(
        f"{t}={sum(rounds[t]['queries'].values()):.1f}s{_phase_note(t)}"
        for t in tags
    )
    lines += [f"**Totals:** {totals}", ""]
    if flags:
        lines += ["## Flags", ""]
        lines += [f"- `{q}` — {note}" for q, note in flags]
        lines += [""]
    else:
        lines += ["No regressions, vanished queries, or errors.", ""]
    lines += [
        "## Per-query trend",
        "",
        "| query | latest | best prior | note |",
        "| --- | --- | --- | --- |",
    ]
    for q, now, best, note in rows:
        b = f"{best:.2f}" if best is not None else "—"
        lines.append(f"| {q} | {now:.2f} | {b} | {note} |")
    if vanished:
        lines += ["", "## Vanished", ""]
        lines += [f"- `{q}`" for q in vanished]
    if errors:
        lines += ["", "## Errors in latest round", ""]
        lines += [f"- `{q}`: {m[:200]}" for q, m in sorted(errors.items())]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    md_out = None
    if "--md" in args:
        i = args.index("--md")
        md_out = args[i + 1] if i + 1 < len(args) else os.path.join(
            _ROOT, "BENCH_HISTORY.md"
        )
        del args[i : i + 2]
    threshold = float(args[0]) if args else 2.0
    rounds = load_rounds()
    if len(rounds) < 2:
        print(f"{len(rounds)} usable BENCH round(s) — need 2+ to compare")
        return 0
    tags, latest, rows, vanished, errors, flags = analyze(rounds, threshold)
    print(
        f"rounds: {', '.join(tags)}; latest={latest}; "
        f"threshold={threshold}x (+0.5s absolute)"
    )
    for q, now, best, note in rows:
        if note and note != "new":
            b = f"{best:.2f}" if best is not None else "-"
            print(f"  {q}: {now:.2f}s (best prior {b}s) {note}")
    for q in vanished:
        print(f"  {q}: VANISHED from latest round")
    for q, msg in sorted(errors.items()):
        print(f"  {q}: ERRORED {msg[:120]}")
    totals = {t: sum(rounds[t]["queries"].values()) for t in tags}
    print("totals: " + ", ".join(f"{t}={v:.1f}s" for t, v in totals.items()))
    if flags:
        print(f"{len(flags)} flag(s)")
    else:
        print("no per-query regressions flagged")
    if md_out:
        write_md(md_out, tags, latest, rounds, rows, vanished, errors, flags)
        print(f"wrote {md_out}")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
