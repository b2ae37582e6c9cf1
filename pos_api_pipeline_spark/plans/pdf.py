"""Minimal pure-stdlib PDF writer for report delivery (S17).

The reference converts its markdown reports to PDF with external
tooling (reference: reporting/utils.py:10-50 — markdown_pdf, i.e. a
styled HTML/CSS rendering). This runtime has no PDF library, but the
PDF 1.4 subset needed for a styled text report — catalog, page tree,
Type1 text objects, stroked rules, xref table — is a few dozen lines
of byte bookkeeping, so the delivery story no longer ends at markdown.

Rendering model: line-oriented layout of the markdown SOURCE with
CSS-like styling to match the reference's intent —

- ``#``/``##``/``###`` headings in Helvetica-Bold, sized by level,
  in a dark accent color, with extra space above;
- horizontal rules (``---`` lines and table separator rows) drawn as
  actual gray strokes;
- bullet lines rendered with a typographic middle dot and indent;
- inline ``**bold**`` / `` `code` `` markers stripped for display;
- body (including table rows) in Courier so columns align;
- a gray "page i / n" footer per page.

Deliberately a "styled source" renderer, not a full markdown engine.
"""

from __future__ import annotations

import re
from pathlib import Path

_PAGE_W, _PAGE_H = 612, 792  # US Letter, points
_MARGIN = 54
_LEADING = 13
_LINES_PER_PAGE = (_PAGE_H - 2 * _MARGIN) // _LEADING  # plain-body capacity

_HEAD_COLOR = "0.13 0.21 0.38"  # dark slate — headings
_BODY_COLOR = "0 0 0"
_FOOT_COLOR = "0.55 0.55 0.55"
_RULE_GRAY = "0.75"

_INLINE_MARKS = re.compile(r"\*\*|`")
_RULE_LINE = re.compile(r"^\s*(-{3,}|={3,}|\*{3,})\s*$")
_TABLE_SEP = re.compile(r"^\s*\|?[\s:|-]+\|[\s:|-]*$")


def _escape(line: str) -> bytes:
    out = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    # PDF string objects in this writer are Latin-1; anything outside
    # degrades to '?' rather than corrupting the file.
    return out.encode("latin-1", errors="replace")


def _layout_line(line: str):
    """(kind, text, font, size, color, space_before, leading)."""
    if _RULE_LINE.match(line) or _TABLE_SEP.match(line):
        return ("rule", "", "/FH", 0, _BODY_COLOR, 3, 8)
    if line.startswith("# "):
        return ("text", _INLINE_MARKS.sub("", line[2:]), "/FB", 16,
                _HEAD_COLOR, 8, 20)
    if line.startswith("## "):
        return ("text", _INLINE_MARKS.sub("", line[3:]), "/FB", 13,
                _HEAD_COLOR, 6, 17)
    if line.startswith("### "):
        return ("text", _INLINE_MARKS.sub("", line[4:]), "/FB", 11,
                _HEAD_COLOR, 4, 15)
    text = _INLINE_MARKS.sub("", line)
    if text.lstrip().startswith("- "):
        indent = len(text) - len(text.lstrip())
        text = " " * indent + "\xb7 " + text.lstrip()[2:]
    return ("text", text, "/FC", 9, _BODY_COLOR, 0, _LEADING)


def _paginate(lines):
    """Split styled lines into pages of (kind, ..., y) tuples."""
    pages, page, y = [], [], _PAGE_H - _MARGIN
    for raw in lines:
        kind, text, font, size, color, before, leading = _layout_line(raw)
        if page:  # no extra space at the top of a page
            y -= before
        if y - leading < _MARGIN - _LEADING:  # page full
            pages.append(page)
            page, y = [], _PAGE_H - _MARGIN
        page.append((kind, text, font, size, color, y))
        y -= leading
    pages.append(page)
    return pages


def markdown_to_pdf_bytes(md_text: str) -> bytes:
    """Render markdown text to styled PDF bytes (multi-page)."""
    pages = _paginate(md_text.splitlines() or [""])
    n_pages = len(pages)

    # Object numbering: 1 catalog, 2 pages, 3 Helvetica-Bold,
    # 4 Courier, 5 Helvetica, then (page, content) pairs.
    objs: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        3: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>",
        4: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    kids = " ".join(f"{6 + 2 * i} 0 R" for i in range(n_pages))
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    for i, page in enumerate(pages):
        page_obj, content_obj = 6 + 2 * i, 7 + 2 * i
        objs[page_obj] = (
            f"<< /Type /Page /Parent 2 0 R "
            f"/MediaBox [0 0 {_PAGE_W} {_PAGE_H}] "
            f"/Resources << /Font "
            f"<< /FB 3 0 R /FC 4 0 R /FH 5 0 R >> >> "
            f"/Contents {content_obj} 0 R >>"
        ).encode()
        stream = bytearray()
        for kind, text, font, size, color, y in page:
            if kind == "rule":
                stream += (
                    f"{_RULE_GRAY} G 0.7 w "
                    f"{_MARGIN} {y} m {_PAGE_W - _MARGIN} {y} l S\n"
                ).encode()
                continue
            stream += (
                f"BT {font} {size} Tf {color} rg "
                f"{_MARGIN} {y} Td ".encode()
                + b"(" + _escape(text) + b") Tj ET\n"
            )
        stream += (
            f"BT /FH 8 Tf {_FOOT_COLOR} rg "
            f"{_PAGE_W / 2 - 20:.0f} 30 Td "
            f"(Page {i + 1} / {n_pages}) Tj ET"
        ).encode()
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
