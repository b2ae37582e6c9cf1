"""Report assembly: KPI scalars + markdown rendering (S17).

Strictly the presentation boundary: everything here happens AFTER the
engine work, on tiny aggregated frames pulled with ``toPandas()``.
PDF/email delivery (reference: reporting/utils.py) is intentionally a
thin shell — gated behind import-try since no SMTP/PDF libs exist in
this runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def pct_change(current: float, previous: float) -> str:
    """C14 — KPI percent change; '(new)' when the previous period is
    zero (reference: monthly_report.py:548-554)."""
    if previous == 0:
        return "(new)"
    return f"{(current - previous) / previous * 100.0:+.1f}%"


def df_to_markdown(df: DataFrame, max_rows: int = 20) -> str:
    """Render a (small, already-aggregated) DataFrame as a markdown
    table. limit() guards against accidentally rendering a fact
    table."""
    pdf = df.limit(max_rows).toPandas()
    header = "| " + " | ".join(pdf.columns) + " |"
    sep = "| " + " | ".join("---" for _ in pdf.columns) + " |"
    rows = [
        "| " + " | ".join(str(v) for v in row) + " |"
        for row in pdf.itertuples(index=False)
    ]
    return "\n".join([header, sep, *rows])


def render_report(title: str, sections: dict[str, DataFrame]) -> str:
    """Assemble a markdown report from named analytic DataFrames
    (the shape of the reference's monthly/cumulative templates,
    monthly_report.py:514-627)."""
    parts = [f"# {title}", ""]
    for name, df in sections.items():
        parts += [f"## {name.replace('_', ' ').title()}", "", df_to_markdown(df), ""]
    return "\n".join(parts)


def convert_md_to_pdf(md_text: str, out_path: str) -> bool:
    """S17 PDF sink (reference: reporting/utils.py:10-50) — renders
    the markdown report to a real multi-page PDF via the stdlib
    writer in plans/pdf.py. Returns True on success; never raises
    (delivery failures must not fail the pipeline, matching the
    reference's try/except around conversion)."""
    try:
        from pos_api_pipeline_spark.plans.pdf import markdown_to_pdf

        markdown_to_pdf(md_text, out_path)
        return True
    except Exception:  # noqa: BLE001 — delivery is best-effort
        return False


def send_report_by_email(md_text: str, recipients: list[str]) -> bool:
    """S17 SMTP shell (reference: reporting/utils.py:52-96) — network
    delivery is environment-dependent; never raises."""
    return False
