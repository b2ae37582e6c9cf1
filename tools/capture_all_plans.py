"""Capture `.explain("formatted")` for EVERY registry query to files.

Usage: python tools/capture_all_plans.py OUTDIR [sf_dir]

Writes one ``OUTDIR/<query>.txt`` per registry entry holding the
formatted physical plan (tree + operator details). Run at two commits
(git worktree for the old one) and diff the directories to see every
plan change a round made — the evidence base for
``plans/r{N}/<query>_{before,after}.txt``.

The repo root is derived from this file's location so the tool runs
correctly inside a worktree checkout (imports that worktree's code,
not the main repo's).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    outdir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as e
    from pos_api_pipeline_spark.session import get_spark

    spark = get_spark("capture_all_plans")
    qs = e.queries()
    n_err = 0
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep going; record the failure
            text = f"ERROR building plan: {exc!r}\n"
            n_err += 1
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(text)
    print(f"wrote {len(qs)} plans to {outdir}, {n_err} errors")


if __name__ == "__main__":
    main()
