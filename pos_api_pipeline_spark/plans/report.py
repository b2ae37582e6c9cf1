"""Report assembly: KPI scalars + markdown rendering (S17).

Strictly the presentation boundary: everything here happens AFTER the
engine work, on tiny aggregated frames pulled with ``toPandas()``.
PDF delivery renders through the stdlib writer in plans/pdf.py;
email delivery is a real smtplib MIME send (host via argument or
REPORT_SMTP_HOST), best-effort — a down relay never fails the
pipeline, matching the reference's try/except.
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


def send_report_by_email(
    md_text: str,
    recipients: list[str],
    subject: str = "Analytics report",
    sender: str = "reports@localhost",
    host: str | None = None,
    port: int = 25,
    attach_pdf: bool = False,
    use_starttls: bool = False,
    username: str | None = None,
    password: str | None = None,
) -> bool:
    """S17 SMTP sink (reference: reporting/utils.py:52-96): a real
    ``smtplib`` delivery of the markdown report as a MIME message,
    optionally with the PDF rendering attached. ``host`` defaults to
    the ``REPORT_SMTP_HOST`` env var; with neither set the sink is a
    no-op returning False (matching the reference's best-effort
    delivery — a down mail relay must never fail the pipeline).
    ``use_starttls``/``username``/``password`` mirror the reference's
    STARTTLS + login delivery path (credentials default to the
    ``REPORT_SMTP_USER`` / ``REPORT_SMTP_PASSWORD`` env vars). Login
    is attempted ONLY under STARTTLS — credentials never go over a
    plaintext connection, and a plain relay (like the in-process test
    server) is never surprised with an AUTH it doesn't advertise just
    because the env vars happen to be exported.
    Unit-tested against an in-process SMTP server."""
    import os

    host = host or os.environ.get("REPORT_SMTP_HOST")
    if not host or not recipients:
        return False
    if use_starttls:
        username = username or os.environ.get("REPORT_SMTP_USER")
        password = password or os.environ.get("REPORT_SMTP_PASSWORD")
    else:
        username = password = None
    try:
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = subject
        msg["From"] = sender
        msg["To"] = ", ".join(recipients)
        msg.set_content(md_text)
        if attach_pdf:
            import tempfile

            with tempfile.NamedTemporaryFile(suffix=".pdf") as tmp:
                if convert_md_to_pdf(md_text, tmp.name):
                    with open(tmp.name, "rb") as fh:
                        pdf_bytes = fh.read()
                    msg.add_attachment(
                        pdf_bytes,
                        maintype="application",
                        subtype="pdf",
                        filename="report.pdf",
                    )
        with smtplib.SMTP(host, port, timeout=10) as smtp:
            if use_starttls:
                smtp.starttls()
            if username and password:
                smtp.login(username, password)
            smtp.send_message(msg)
        return True
    except Exception:  # noqa: BLE001 — delivery is best-effort
        return False
