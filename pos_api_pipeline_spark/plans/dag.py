"""Scheduler-shaped orchestration: the reference's production DAG as
a pure-Python composition (reference: dags/production_etl_dag.py).

The reference runs an Airflow DAG daily at 07:00:

    start >> daily_etl >> check_first_of_month
    check >> [monthly_report, cumulative_report] >> end
    check >> skip_reporting >> end

This module reproduces that lifecycle — same branch rule, same task
names, same downstream join semantics — without importing a
scheduler: any cron/Airflow/dbt wrapper can call ``run_production_etl``
once a day. Task statuses come back Airflow-style
('success'/'skipped'/'failed') so a wrapper can forward them.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

from pyspark.sql import SparkSession

from pos_api_pipeline_spark.plans import pipelines, report
from pos_api_pipeline_spark.plans.plots import generate_all_report_figures

MONTHLY_TASKS = ["run_monthly_report_task", "run_cumulative_report_task"]
SKIP_TASK = "skip_reporting_task"


def check_if_first_day_of_month(run_date: dt.date) -> list[str] | str:
    """The reference's BranchPythonOperator
    (dags/production_etl_dag.py:17-27): reports run only when the
    daily run lands on the 1st (covering the month that just closed)."""
    if run_date.day == 1:
        return MONTHLY_TASKS
    return SKIP_TASK


def report_month_for(run_date: dt.date) -> tuple[int, int]:
    """The month the first-of-month run reports on: the one that just
    ended (the reference's 'last complete month',
    monthly_report.py:634-650)."""
    last_day_prev = run_date.replace(day=1) - dt.timedelta(days=1)
    return last_day_prev.year, last_day_prev.month


def run_production_etl(
    spark: SparkSession,
    run_date: dt.date,
    fetch_receipts_page: Callable,
    lake_path: str,
    state_file: str,
    report_dir: str | None = None,
) -> dict:
    """One scheduled tick of the production DAG. Returns
    {task_id: status, ...} plus the artifacts produced.

    Branch semantics match the Airflow original: the ETL always runs;
    on the 1st both report tasks run and 'skip_reporting_task' is
    skipped; any other day the reports are skipped. 'end' succeeds
    when at least one upstream did (none_failed_min_one_success) —
    with no failures that is always true, and a failed ETL raises out
    of this function exactly like a failed Airflow task fails the run.
    """
    statuses: dict[str, object] = {"start": "success"}
    etl = pipelines.daily_incremental_run(
        spark, fetch_receipts_page, lake_path, state_file
    )
    statuses["run_daily_incremental_etl"] = "success"
    statuses["etl_result"] = etl

    branch = check_if_first_day_of_month(run_date)
    statuses["check_if_first_day_of_month"] = "success"

    if branch == SKIP_TASK:
        for t in MONTHLY_TASKS:
            statuses[t] = "skipped"
        statuses[SKIP_TASK] = "success"
    else:
        statuses[SKIP_TASK] = "skipped"
        year, month = report_month_for(run_date)

        monthly = pipelines.monthly_report_data(spark, lake_path, year, month)
        monthly_md = report.render_report(
            f"Monthly Report {year}-{month:02d}", monthly
        )
        statuses["run_monthly_report_task"] = "success"
        statuses["monthly_report_md"] = monthly_md

        cumulative = pipelines.cumulative_report_data(spark, lake_path)
        cumulative_md = report.render_report("Cumulative Report", cumulative)
        statuses["run_cumulative_report_task"] = "success"
        statuses["cumulative_report_md"] = cumulative_md

        if report_dir is not None:
            from pos_api_pipeline_spark import lake
            from pos_api_pipeline_spark.operators.cleaning import (
                clean_for_reporting,
            )
            from pos_api_pipeline_spark.operators.combos import (
                explode_combo_items,
            )
            from pos_api_pipeline_spark.operators.windows import window_dedup

            cleaned = clean_for_reporting(
                window_dedup(lake.read_lake(spark, lake_path))
            ).cache()
            figures = generate_all_report_figures(
                cleaned, explode_combo_items(cleaned), report_dir
            )
            cleaned.unpersist()
            statuses["figures"] = [str(p) for p in figures]
            # Deliverables: markdown + PDF per report (reference:
            # reporting/utils.py conversion step).
            from pathlib import Path

            rd = Path(report_dir)
            for name, md in (
                (f"monthly_report_{year}-{month:02d}", monthly_md),
                ("cumulative_report", cumulative_md),
            ):
                (rd / f"{name}.md").write_text(md, encoding="utf-8")
                report.convert_md_to_pdf(md, rd / f"{name}.pdf")

    statuses["end"] = "success"
    return statuses


def backfill(
    spark: SparkSession,
    start_date: dt.date,
    end_date: dt.date,
    fetch_receipts_page: Callable,
    lake_path: str,
    state_file: str,
    report_dir: str | None = None,
) -> list[dict]:
    """Airflow-backfill analog: replay one production tick per
    calendar day over [start_date, end_date], in order. Returns the
    per-day status dicts (each tagged with its run_date).

    Idempotency is inherited, not re-implemented: the daily ETL's
    watermark state makes replayed fetches incremental, and the
    merge-overwrite upsert (W1 latest-wins dedup + dynamic partition
    overwrite) converges when a day is run twice — so a backfill over
    an already-processed range is safe, exactly like re-running an
    Airflow interval. First-of-month ticks regenerate their reports,
    which is precisely what a reporting backfill is for.
    """
    if start_date > end_date:
        raise ValueError(f"start {start_date} after end {end_date}")
    runs = []
    day = start_date
    while day <= end_date:
        statuses = run_production_etl(
            spark, day, fetch_receipts_page, lake_path, state_file,
            report_dir=report_dir,
        )
        runs.append({"run_date": day, **statuses})
        day += dt.timedelta(days=1)
    return runs
