"""PDF sink tests: the stdlib writer produces structurally valid,
multi-page PDF from markdown reports (reference: reporting/utils.py
md→PDF conversion)."""

from __future__ import annotations

import re
import threading

from pos_api_pipeline_spark.plans import report
from pos_api_pipeline_spark.plans.pdf import (
    _LINES_PER_PAGE,
    markdown_to_pdf_bytes,
)

MD = "\n".join(
    [
        "# Monthly Report 2025-08",
        "",
        "## Kpis",
        "| month_tag | revenue |",
        "| --- | --- |",
        "| 2025-08 | 1234.5 |",
    ]
)


def test_pdf_structure():
    data = markdown_to_pdf_bytes(MD)
    assert data.startswith(b"%PDF-1.4")
    assert data.rstrip().endswith(b"%%EOF")
    assert b"/Type /Catalog" in data
    assert b"/Count 1" in data
    # Title reaches the content stream (parens escaped as needed).
    assert b"(Monthly Report 2025-08) Tj" in data
    # xref offsets actually point at their objects.
    xref_pos = int(data.split(b"startxref\n")[1].split(b"\n")[0])
    assert data[xref_pos : xref_pos + 4] == b"xref"
    m = re.search(rb"\n(\d{10}) 00000 n", data)
    first_obj_off = int(m.group(1))
    assert data[first_obj_off : first_obj_off + 7] == b"1 0 obj"


def test_pdf_paginates():
    long_md = "\n".join(f"line {i}" for i in range(_LINES_PER_PAGE * 2 + 5))
    data = markdown_to_pdf_bytes(long_md)
    assert b"/Count 3" in data
    assert data.count(b"/Type /Page ") == 3


def test_pdf_escapes_special_chars():
    data = markdown_to_pdf_bytes("value (50%) \\ backslash")
    assert rb"(value \(50%\) \\ backslash) Tj" in data


def test_convert_md_to_pdf_writes_file(tmp_path):
    out = tmp_path / "report.pdf"
    assert report.convert_md_to_pdf(MD, str(out)) is True
    assert out.stat().st_size > 400
    assert out.read_bytes().startswith(b"%PDF-")


class _MiniSMTP(threading.Thread):
    """Minimal in-process SMTP server: accepts one message, records
    the DATA payload, replies with canned codes."""

    def __init__(self):
        super().__init__(daemon=True)
        import socket

        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.payload = b""

    def run(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 mini ESMTP\r\n")
        in_data = False
        data = []
        while True:
            line = f.readline()
            if not line:
                break
            if in_data:
                if line.rstrip(b"\r\n") == b".":
                    self.payload = b"".join(data)
                    conn.sendall(b"250 OK\r\n")
                    in_data = False
                else:
                    data.append(line)
            elif line.upper().startswith((b"EHLO", b"HELO")):
                conn.sendall(b"250 mini\r\n")
            elif line.upper().startswith(b"DATA"):
                conn.sendall(b"354 go\r\n")
                in_data = True
            elif line.upper().startswith(b"QUIT"):
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()


def test_send_report_by_email_delivers_mime():
    import threading as _t  # noqa: F401 — ensure import at test time

    from pos_api_pipeline_spark.plans.report import send_report_by_email

    srv = _MiniSMTP()
    srv.start()
    ok = send_report_by_email(
        "# Report\n\nhello world",
        ["ops@example.com"],
        subject="March report",
        host="127.0.0.1",
        port=srv.port,
    )
    srv.join(timeout=5)
    assert ok
    assert b"hello world" in srv.payload
    assert b"Subject: March report" in srv.payload
    assert b"To: ops@example.com" in srv.payload


def test_send_report_by_email_no_host_is_noop():
    from pos_api_pipeline_spark.plans.report import send_report_by_email

    import os

    assert "REPORT_SMTP_HOST" not in os.environ
    assert send_report_by_email("x", ["a@b"]) is False
    assert send_report_by_email("x", [], host="127.0.0.1") is False


def test_pdf_styling_rules_bullets_footer():
    md = "\n".join(
        [
            "# Title",
            "---",
            "- first **bold** item",
            "| a | b |",
            "| --- | --- |",
            "| 1 | `x` |",
        ]
    )
    data = markdown_to_pdf_bytes(md)
    # hrule + table separator are stroked lines, not text
    assert data.count(b" l S\n") == 2
    assert b"(| --- | --- |)" not in data
    # bullet rendered with a middle dot, inline marks stripped
    assert "(· first bold item) Tj".encode("latin-1") in data
    assert b"**" not in data and b"(| 1 | x |) Tj" in data
    # heading color + page footer
    assert b"/FB 16 Tf 0.13 0.21 0.38 rg" in data
    assert b"(Page 1 / 1) Tj" in data


def test_send_report_env_creds_do_not_break_plain_relay(monkeypatch):
    """Exported SMTP credentials must not trigger AUTH on a plaintext
    relay (login is gated on use_starttls)."""
    from pos_api_pipeline_spark.plans.report import send_report_by_email

    monkeypatch.setenv("REPORT_SMTP_USER", "ops")
    monkeypatch.setenv("REPORT_SMTP_PASSWORD", "secret")
    srv = _MiniSMTP()
    srv.start()
    ok = send_report_by_email(
        "body", ["a@b"], host="127.0.0.1", port=srv.port
    )
    srv.join(timeout=5)
    assert ok  # no AUTH attempted against the AUTH-less mini server
    assert b"body" in srv.payload
