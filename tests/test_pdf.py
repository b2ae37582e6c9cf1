"""PDF sink tests: the stdlib writer produces structurally valid,
multi-page PDF from markdown reports (reference: reporting/utils.py
md→PDF conversion)."""

from __future__ import annotations

import re

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
