"""End-to-end pipeline lifecycle tests: daily incremental run →
lake → monthly/cumulative report data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_api_pipeline_spark.plans import pipelines, report


def _receipt(n, date, order, items):
    return {
        "receipt_number": n,
        "receipt_date": date,
        "created_at": date,
        "updated_at": date,
        "order": order,
        "payments": [{"type": "CASH"}],
        "line_items": [
            {
                "item_name": it,
                "cost": 10.0,
                "price": 50.0,
                "total_money": 50.0,
                "line_modifiers": [{"name": "Mayonesa", "option": "Ajo"}]
                if "Doble" in it
                else [],
            }
            for it in items
        ],
    }


@pytest.fixture()
def api_pages():
    batch = [
        _receipt("1-1", "2025-07-21T16:00:00.000Z", "Mesa 2",
                 ["Doble Chicken", "Papas Fritas"]),
        _receipt("1-2", "2025-07-22T17:00:00.000Z", "A domicilio",
                 ["Malteada Chocolate"]),
        _receipt("1-3", "2025-08-02T12:00:00.000Z", "Para Llevar",
                 ["Doble Chicken"]),
    ]
    return lambda cursor: (batch, None)


def _seed_state(state_file, wm="2025-01-01T00:00:00.000Z"):
    import json

    from pos_api_pipeline_spark.sources.state import STATE_KEY

    with open(state_file, "w") as f:
        json.dump({STATE_KEY: wm}, f)


def test_production_dag_branches(spark, tmp_path, api_pages):
    """Drive a synthetic month boundary through both DAG branches
    (reference: dags/production_etl_dag.py:17-27, 96-101)."""
    import datetime as dt

    from pos_api_pipeline_spark.plans import dag

    lake_path = str(tmp_path / "lake")
    state_file = str(tmp_path / "state.json")
    _seed_state(state_file)

    # Mid-month tick: ETL runs, reports skipped.
    mid = dag.run_production_etl(
        spark, dt.date(2025, 8, 15), api_pages, lake_path, state_file
    )
    assert mid["run_daily_incremental_etl"] == "success"
    assert mid["run_monthly_report_task"] == "skipped"
    assert mid["run_cumulative_report_task"] == "skipped"
    assert mid["skip_reporting_task"] == "success"
    assert mid["end"] == "success"
    assert mid["etl_result"]["rows"] == 4

    # First-of-month tick: reports run on the month that just closed.
    assert dag.report_month_for(dt.date(2025, 9, 1)) == (2025, 8)
    first = dag.run_production_etl(
        spark,
        dt.date(2025, 9, 1),
        api_pages,
        lake_path,
        state_file,
        report_dir=str(tmp_path / "figures"),
    )
    assert first["run_monthly_report_task"] == "success"
    assert first["run_cumulative_report_task"] == "success"
    assert first["skip_reporting_task"] == "skipped"
    assert "# Monthly Report 2025-08" in first["monthly_report_md"]
    assert "# Cumulative Report" in first["cumulative_report_md"]
    assert len(first["figures"]) >= 12  # all fixed figures written
    from pathlib import Path

    assert all(Path(p).exists() for p in first["figures"])
    fig_dir = tmp_path / "figures"
    assert (fig_dir / "monthly_report_2025-08.md").exists()
    assert (fig_dir / "monthly_report_2025-08.pdf").read_bytes().startswith(
        b"%PDF-"
    )
    assert (fig_dir / "cumulative_report.pdf").exists()


def test_daily_run_then_reports(spark, tmp_path, api_pages):
    lake_path = str(tmp_path / "lake")
    state_file = str(tmp_path / "state.json")
    _seed_state(state_file)  # fixture data predates the month-start fallback

    status = pipelines.daily_incremental_run(
        spark, api_pages, lake_path, state_file
    )
    assert status["rows"] == 4  # 4 line items across 3 receipts
    assert status["watermark"] == "2025-08-02T12:00:00.000Z"

    # Replay the same batch: watermark filters everything out.
    status2 = pipelines.daily_incremental_run(
        spark, api_pages, lake_path, state_file
    )
    assert status2["rows"] == 0

    monthly = pipelines.monthly_report_data(spark, lake_path, 2025, 8)
    top = monthly["top_products"].collect()
    assert top[0].item_name == "Doble Chicken"
    kpis = {r.month_tag: r for r in monthly["kpis"].collect()}
    assert kpis["2025-08"].n_receipts == 1
    assert kpis["2025-07"].n_receipts == 2  # previous month included

    cumulative = pipelines.cumulative_report_data(spark, lake_path)
    k = cumulative["kpis"].collect()[0]
    assert k.n_receipts == 3
    assert k.total_revenue == 200.0
    heat = cumulative["day_hour_heatmap"].collect()
    assert len(heat[0].asDict()) == 25  # day + 24 hour columns

    md = report.render_report(
        "Cumulative", {"kpis": cumulative["kpis"]}
    )
    assert "total_revenue" in md and md.startswith("# Cumulative")


def test_monthly_handles_january(spark, tmp_path, api_pages):
    # Reference crashes on month-1==0 (monthly_report.py:40); we roll
    # the year — January compares against December of the prior year.
    lake_path = str(tmp_path / "lake")
    state_file = str(tmp_path / "s.json")
    _seed_state(state_file)
    pipelines.daily_incremental_run(spark, api_pages, lake_path, state_file)
    monthly = pipelines.monthly_report_data(spark, lake_path, 2025, 1)
    assert monthly["kpis"].count() == 0  # no Jan/Dec data — but no crash


def test_daily_run_tracks_items_scd2(spark, tmp_path, api_pages):
    state_file = str(tmp_path / "state.json")
    _seed_state(state_file)
    items_page = lambda cur: (  # noqa: E731
        [{"id": "i1", "item_name": "Burger", "price": 50.0}], None
    )
    pipelines.daily_incremental_run(
        spark, api_pages, str(tmp_path / "lake"), state_file,
        fetch_items_page=items_page,
        items_dim_path=str(tmp_path / "items_dim"),
    )
    dim = spark.read.parquet(str(tmp_path / "items_dim"))
    rows = dim.collect()
    assert len(rows) == 1
    assert rows[0].item_name == "Burger" and rows[0].is_current


def test_pct_change():
    assert report.pct_change(150.0, 100.0) == "+50.0%"
    assert report.pct_change(50.0, 0.0) == "(new)"


def test_backfill_replays_days_and_branches_once(spark, tmp_path, api_pages):
    import datetime as dt

    from pos_api_pipeline_spark import lake
    from pos_api_pipeline_spark.plans import dag

    lake_path = str(tmp_path / "lake")
    state_file = str(tmp_path / "state.json")
    _seed_state(state_file)

    runs = dag.backfill(
        spark,
        dt.date(2025, 7, 31),
        dt.date(2025, 8, 2),
        api_pages,
        lake_path,
        state_file,
    )
    assert [r["run_date"].day for r in runs] == [31, 1, 2]
    # Only the Aug 1 tick branches into reports (covering July).
    report_days = [
        r["run_date"].day
        for r in runs
        if r["run_monthly_report_task"] == "success"
    ]
    assert report_days == [1]
    assert runs[0]["run_monthly_report_task"] == "skipped"
    assert "Monthly Report 2025-07" in runs[1]["monthly_report_md"]
    # Replayed fetches + latest-wins merge converge: 4 line items once.
    assert lake.read_lake(spark, lake_path).count() == 4

    # Backfilling the same range again is idempotent.
    runs2 = dag.backfill(
        spark, dt.date(2025, 7, 31), dt.date(2025, 8, 2),
        api_pages, lake_path, state_file,
    )
    assert lake.read_lake(spark, lake_path).count() == 4
    assert len(runs2) == 3


def test_installable_dag_module_without_airflow(tmp_path, monkeypatch):
    """dags/production_etl_dag.py: importable without airflow
    (dag=None), task topology names match plans/dag.py, and the
    branch callable mirrors the reference rule."""
    import datetime as dt
    import importlib.util
    import sys

    import pathlib

    dag_path = (
        pathlib.Path(__file__).resolve().parent.parent
        / "dags"
        / "production_etl_dag.py"
    )
    spec = importlib.util.spec_from_file_location(
        "production_etl_dag", str(dag_path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    try:
        import airflow  # noqa: F401
        has_airflow = True
    except ImportError:
        has_airflow = False
    if not has_airflow:
        assert mod.dag is None
    assert mod.TASK_IDS == [
        "start",
        "run_daily_incremental_etl",
        "check_if_first_day_of_month",
        "run_monthly_report_task",
        "run_cumulative_report_task",
        "skip_reporting_task",
        "end",
    ]

    class _DIE:
        def __init__(self, d):
            self._d = d

        def date(self):
            return self._d

    assert mod.task_branch(
        data_interval_end=_DIE(dt.date(2025, 8, 1))
    ) == ["run_monthly_report_task", "run_cumulative_report_task"]
    assert (
        mod.task_branch(data_interval_end=_DIE(dt.date(2025, 8, 2)))
        == "skip_reporting_task"
    )
    sys.modules.pop("production_etl_dag", None)
