"""Minimal pure-stdlib SVG chart renderer — the drawing backend for
the reference's 13 matplotlib/seaborn figures (plots.py).

The runtime ships no plotting or imaging library, so charts are
emitted as SVG: a real, viewable artifact (every browser renders it)
that is also plain text — unit tests assert on series names, axis
labels, and value annotations directly.

Strictly driver-side presentation: renderers take plain Python lists
already pulled from tiny aggregated DataFrames. Nothing here touches
Spark.

Supported panel kinds (matching what the reference draws):
- grouped / stacked bar charts with optional per-segment labels
- line charts with per-series styles, point markers, annotations
- heatmaps with per-cell annotations
Panels compose horizontally into one figure (the reference's
``plt.subplots(1, N)`` layout).
"""

from __future__ import annotations

import html
from dataclasses import dataclass, field
from pathlib import Path

# matplotlib 'tab10' hex values — same palette the reference passes
# to seaborn, so series colors match visually.
TAB10 = [
    "#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
    "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf",
]

# Yellow-Green-Blue ramp endpoints for heatmaps (reference: 'YlGnBu').
_YLGNBU = [(255, 255, 217), (65, 182, 196), (8, 29, 88)]


def _esc(s: object) -> str:
    return html.escape(str(s), quote=True)


def _fmt(v: float) -> str:
    return f"{v:g}"


def _ylgnbu(frac: float) -> str:
    """Interpolate the 3-stop YlGnBu ramp at frac in [0, 1]."""
    frac = min(max(frac, 0.0), 1.0)
    if frac <= 0.5:
        a, b, t = _YLGNBU[0], _YLGNBU[1], frac * 2
    else:
        a, b, t = _YLGNBU[1], _YLGNBU[2], (frac - 0.5) * 2
    rgb = [round(x + (y - x) * t) for x, y in zip(a, b)]
    return f"rgb({rgb[0]},{rgb[1]},{rgb[2]})"


@dataclass
class BarPanel:
    """Grouped (default) or stacked bars.

    series: [(label, values)] — one value per category.
    labels: optional [(series_idx, cat_idx) -> str] matrix aligned
    with ``series`` for on-bar annotations (counts or percentages).
    """

    categories: list
    series: list
    title: str = ""
    xlabel: str = ""
    ylabel: str = ""
    stacked: bool = False
    labels: list | None = None


@dataclass
class LinePanel:
    """Line chart; series: [(label, values, style)] with style in
    {'solid', 'dashed'}. annotations: [(x_idx, y, text)]."""

    x_labels: list
    series: list
    title: str = ""
    xlabel: str = ""
    ylabel: str = ""
    annotations: list = field(default_factory=list)
    note: str = ""


@dataclass
class HeatmapPanel:
    """values[row][col] floats; annotated per cell like
    sns.heatmap(annot=True)."""

    row_labels: list
    col_labels: list
    values: list
    title: str = ""
    xlabel: str = ""
    ylabel: str = ""


_PANEL_W = 520
_PANEL_H = 380
_MARGIN = dict(left=64, right=150, top=48, bottom=72)


def _y_scale(max_val: float, plot_h: float):
    top = max_val if max_val > 0 else 1.0
    top *= 1.08  # headroom like matplotlib's default margins
    return lambda v: plot_h - (v / top) * plot_h, top


def _axes(x0, y0, pw, ph, title, xlabel, ylabel, y_top):
    out = [
        f'<g transform="translate({x0},{y0})">',
        f'<rect width="{pw}" height="{ph}" fill="white" stroke="#cccccc"/>',
    ]
    if title:
        out.append(
            f'<text x="{pw / 2}" y="-12" text-anchor="middle" '
            f'font-size="15" font-weight="bold">{_esc(title)}</text>'
        )
    if xlabel:
        out.append(
            f'<text x="{pw / 2}" y="{ph + 52}" text-anchor="middle" '
            f'font-size="12">{_esc(xlabel)}</text>'
        )
    if ylabel:
        out.append(
            f'<text x="-46" y="{ph / 2}" text-anchor="middle" font-size="12" '
            f'transform="rotate(-90 -46 {ph / 2})">{_esc(ylabel)}</text>'
        )
    # 5 y-ticks with gridlines.
    for i in range(6):
        v = y_top * i / 5
        y = ph - ph * i / 5
        out.append(
            f'<line x1="0" y1="{y:.1f}" x2="{pw}" y2="{y:.1f}" '
            f'stroke="#eeeeee"/>'
        )
        out.append(
            f'<text x="-6" y="{y + 4:.1f}" text-anchor="end" '
            f'font-size="10">{_fmt(round(v, 2))}</text>'
        )
    return out


def _legend(entries, x, y):
    out = []
    for i, (label, color) in enumerate(entries):
        yy = y + i * 18
        out.append(
            f'<rect x="{x}" y="{yy}" width="12" height="12" fill="{color}"/>'
        )
        out.append(
            f'<text x="{x + 17}" y="{yy + 10}" font-size="11" '
            f'class="legend-label">{_esc(label)}</text>'
        )
    return out


def _render_bar(p: BarPanel, x0: int, y0: int) -> list[str]:
    pw = _PANEL_W - _MARGIN["left"] - _MARGIN["right"]
    ph = _PANEL_H - _MARGIN["top"] - _MARGIN["bottom"]
    ncat, nser = len(p.categories), len(p.series)
    if p.stacked:
        max_val = max(
            (sum(vals[c] for _, vals in p.series) for c in range(ncat)),
            default=1.0,
        )
    else:
        max_val = max(
            (v for _, vals in p.series for v in vals), default=1.0
        )
    scale, y_top = _y_scale(max_val, ph)
    out = _axes(x0, y0, pw, ph, p.title, p.xlabel, p.ylabel, y_top)
    slot = pw / max(ncat, 1)
    for c, cat in enumerate(p.categories):
        cx = slot * c
        if p.stacked:
            bw = slot * 0.6
            base = ph
            for s, (label, vals) in enumerate(p.series):
                v = vals[c]
                if v <= 0:
                    continue
                h = ph - scale(v)
                base -= h
                out.append(
                    f'<rect x="{cx + slot * 0.2:.1f}" y="{base:.1f}" '
                    f'width="{bw:.1f}" height="{h:.1f}" '
                    f'fill="{TAB10[s % 10]}" data-series="{_esc(label)}" '
                    f'data-category="{_esc(cat)}" data-value="{_fmt(v)}"/>'
                )
                txt = p.labels[s][c] if p.labels else ""
                if txt:
                    out.append(
                        f'<text x="{cx + slot / 2:.1f}" '
                        f'y="{base + h / 2 + 4:.1f}" text-anchor="middle" '
                        f'font-size="11" fill="white" font-weight="bold">'
                        f"{_esc(txt)}</text>"
                    )
        else:
            bw = slot * 0.8 / max(nser, 1)
            for s, (label, vals) in enumerate(p.series):
                v = vals[c]
                y = scale(v)
                bx = cx + slot * 0.1 + bw * s
                out.append(
                    f'<rect x="{bx:.1f}" y="{y:.1f}" width="{bw:.1f}" '
                    f'height="{ph - y:.1f}" fill="{TAB10[s % 10]}" '
                    f'data-series="{_esc(label)}" data-category="{_esc(cat)}" '
                    f'data-value="{_fmt(v)}"/>'
                )
                txt = p.labels[s][c] if p.labels else ""
                if txt:
                    out.append(
                        f'<text x="{bx + bw / 2:.1f}" y="{y - 4:.1f}" '
                        f'text-anchor="middle" font-size="11">{_esc(txt)}</text>'
                    )
        out.append(
            f'<text x="{cx + slot / 2:.1f}" y="{ph + 16}" '
            f'text-anchor="middle" font-size="11">{_esc(cat)}</text>'
        )
    out += _legend(
        [(label, TAB10[s % 10]) for s, (label, _) in enumerate(p.series)],
        pw + 12,
        6,
    )
    out.append("</g>")
    return out


def _render_line(p: LinePanel, x0: int, y0: int) -> list[str]:
    pw = _PANEL_W - _MARGIN["left"] - _MARGIN["right"]
    ph = _PANEL_H - _MARGIN["top"] - _MARGIN["bottom"]
    nx = len(p.x_labels)
    max_val = max((v for _, vals, _ in p.series for v in vals), default=1.0)
    scale, y_top = _y_scale(max_val, ph)
    out = _axes(x0, y0, pw, ph, p.title, p.xlabel, p.ylabel, y_top)
    step = pw / max(nx - 1, 1)
    for s, (label, vals, style) in enumerate(p.series):
        color = TAB10[s % 10]
        pts = " ".join(
            f"{i * step:.1f},{scale(v):.1f}" for i, v in enumerate(vals)
        )
        dash = ' stroke-dasharray="6,4"' if style == "dashed" else ""
        out.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" '
            f'stroke-width="2"{dash} data-series="{_esc(label)}"/>'
        )
        for i, v in enumerate(vals):
            out.append(
                f'<circle cx="{i * step:.1f}" cy="{scale(v):.1f}" r="3.5" '
                f'fill="{color}"/>'
            )
    for x_idx, y, text in p.annotations:
        out.append(
            f'<text x="{x_idx * step:.1f}" y="{scale(y) - 8:.1f}" '
            f'text-anchor="middle" font-size="9" '
            f'class="annotation">{_esc(text)}</text>'
        )
    if p.note:
        out.append(
            f'<text x="8" y="16" font-size="12" class="note">'
            f"{_esc(p.note)}</text>"
        )
    for i, lab in enumerate(p.x_labels):
        out.append(
            f'<text x="{i * step:.1f}" y="{ph + 16}" text-anchor="middle" '
            f'font-size="10">{_esc(lab)}</text>'
        )
    out += _legend(
        [(label, TAB10[s % 10]) for s, (label, _, _) in enumerate(p.series)],
        pw + 12,
        6,
    )
    out.append("</g>")
    return out


def _render_heatmap(p: HeatmapPanel, x0: int, y0: int) -> list[str]:
    pw = _PANEL_W - _MARGIN["left"] - _MARGIN["right"]
    ph = _PANEL_H - _MARGIN["top"] - _MARGIN["bottom"]
    nrow, ncol = len(p.row_labels), len(p.col_labels)
    flat = [v for row in p.values for v in row]
    vmax = max(flat, default=1.0) or 1.0
    out = _axes(x0, y0, pw, ph, p.title, p.xlabel, p.ylabel, vmax)
    cw, chh = pw / max(ncol, 1), ph / max(nrow, 1)
    for r, rlab in enumerate(p.row_labels):
        for c in range(ncol):
            v = p.values[r][c]
            out.append(
                f'<rect x="{c * cw:.1f}" y="{r * chh:.1f}" width="{cw:.1f}" '
                f'height="{chh:.1f}" fill="{_ylgnbu(v / vmax)}" '
                f'stroke="white" stroke-width="0.5" '
                f'data-row="{_esc(rlab)}" data-col="{_esc(p.col_labels[c])}" '
                f'data-value="{_fmt(v)}"/>'
            )
            out.append(
                f'<text x="{c * cw + cw / 2:.1f}" '
                f'y="{r * chh + chh / 2 + 3:.1f}" text-anchor="middle" '
                f'font-size="9" fill="{"white" if v / vmax > 0.6 else "black"}">'
                f"{v:.0f}</text>"
            )
        out.append(
            f'<text x="-6" y="{r * chh + chh / 2 + 4:.1f}" text-anchor="end" '
            f'font-size="10">{_esc(rlab)}</text>'
        )
    for c, clab in enumerate(p.col_labels):
        out.append(
            f'<text x="{c * cw + cw / 2:.1f}" y="{ph + 14}" '
            f'text-anchor="middle" font-size="9">{_esc(clab)}</text>'
        )
    out.append("</g>")
    return out


def render_figure(path: str | Path, panels: list, suptitle: str = "") -> Path:
    """Render panels side by side into one SVG file, return the path.
    Creates parent directories (the reference's mkdir(parents=True))."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    width = _PANEL_W * len(panels)
    height = _PANEL_H + (30 if suptitle else 0)
    top_extra = 30 if suptitle else 0
    body = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="Helvetica, Arial, sans-serif">',
        f'<rect width="{width}" height="{height}" fill="white"/>',
    ]
    if suptitle:
        body.append(
            f'<text x="{width / 2}" y="22" text-anchor="middle" '
            f'font-size="18" font-weight="bold">{_esc(suptitle)}</text>'
        )
    for i, panel in enumerate(panels):
        x0 = _PANEL_W * i + _MARGIN["left"]
        y0 = _MARGIN["top"] + top_extra
        if isinstance(panel, BarPanel):
            body += _render_bar(panel, x0, y0)
        elif isinstance(panel, LinePanel):
            body += _render_line(panel, x0, y0)
        elif isinstance(panel, HeatmapPanel):
            body += _render_heatmap(panel, x0, y0)
        else:  # pragma: no cover - programming error
            raise TypeError(f"unknown panel type: {type(panel)}")
    body.append("</svg>")
    path.write_text("\n".join(body), encoding="utf-8")
    return path
