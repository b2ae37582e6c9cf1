"""Minimal pure-stdlib PDF writer for report delivery (S17).

The reference converts its markdown reports to PDF with external
tooling (reference: reporting/utils.py:10-50). This runtime has no
PDF library, but the PDF 1.4 subset needed for a text report —
catalog, page tree, Helvetica text objects, xref table — is a few
dozen lines of byte bookkeeping, so the delivery story no longer
ends at markdown.

Rendering model: monospaced layout of the markdown SOURCE with light
styling — '#'-headings set in Helvetica-Bold at larger sizes, all
other lines (including tables) in Courier so columns align. That is
deliberately a "rendered source" PDF, not a full markdown engine.
"""

from __future__ import annotations

from pathlib import Path

_PAGE_W, _PAGE_H = 612, 792  # US Letter, points
_MARGIN = 54
_LEADING = 13
_LINES_PER_PAGE = (_PAGE_H - 2 * _MARGIN) // _LEADING


def _escape(line: str) -> bytes:
    out = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    # PDF string objects in this writer are Latin-1; anything outside
    # degrades to '?' rather than corrupting the file.
    return out.encode("latin-1", errors="replace")


def _line_style(line: str) -> tuple[str, int]:
    """(font resource, size) per markdown line."""
    if line.startswith("# "):
        return "/FB", 16
    if line.startswith("## "):
        return "/FB", 13
    if line.startswith("### "):
        return "/FB", 11
    return "/FC", 9


def markdown_to_pdf_bytes(md_text: str) -> bytes:
    """Render markdown text to PDF bytes (multi-page)."""
    lines = md_text.splitlines() or [""]
    pages = [
        lines[i : i + _LINES_PER_PAGE]
        for i in range(0, len(lines), _LINES_PER_PAGE)
    ]

    # Object numbering: 1 catalog, 2 pages, 3 Helvetica-Bold,
    # 4 Courier, then (page, content) pairs.
    n_pages = len(pages)
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
    }
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(n_pages))
    objs[2] = (
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, page_lines in enumerate(pages):
        page_obj, content_obj = 5 + 2 * i, 6 + 2 * i
        objs[page_obj] = (
            f"<< /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 {_PAGE_W} {_PAGE_H}] "
            f"/Resources << /Font << /FB 3 0 R /FC 4 0 R >> >> "
            f"/Contents {content_obj} 0 R >>"
        ).encode()
        stream = bytearray()
        stream += f"BT\n{_MARGIN} {_PAGE_H - _MARGIN} Td\n{_LEADING} TL\n".encode()
        cur = None
        for line in page_lines:
            font, size = _line_style(line)
            if (font, size) != cur:
                stream += f"{font} {size} Tf\n".encode()
                cur = (font, size)
            stream += b"(" + _escape(line.lstrip("# ")) + b") Tj\nT*\n"
        stream += b"ET"
        objs[content_obj] = (
            f"<< /Length {len(stream)} >>\nstream\n".encode()
            + bytes(stream)
            + b"\nendstream"
        )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    max_obj = max(objs)
    offsets = {}
    for num in range(1, max_obj + 1):
        if num not in objs:
            continue
        offsets[num] = len(buf)
        buf += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(buf)
    buf += f"xref\n0 {max_obj + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for num in range(1, max_obj + 1):
        buf += f"{offsets.get(num, 0):010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {max_obj + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(buf)


def markdown_to_pdf(md_text: str, out_path: str | Path) -> Path:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_bytes(markdown_to_pdf_bytes(md_text))
    return out_path
