"""Plot sinks: convergence curves, top-k ranks, rank distribution — the
engine-side counterpart of the reference's matplotlib tooling
(visualization/visualize_pagerank.py:46-204, dashboard/app.py:968-1043),
with ZERO dependencies: SVG is generated directly (full text labels) and
PNG through a stdlib zlib/struct encoder over a numpy raster (numeric tick
labels via a built-in 5×7 bitmap font).

These are driver-side sinks over tiny data (per-iteration metrics lists,
top-k rows, histogram bins) — never over distributed data; callers pass
collected rows or the engine's metrics lists.
"""

from __future__ import annotations

import struct
import zlib
from math import log10

import numpy as np

# ------------------------------------------------------------------ PNG core

_FONT = {  # 5x7 bitmap font for numeric labels
    "0": ["01110", "10001", "10011", "10101", "11001", "10001", "01110"],
    "1": ["00100", "01100", "00100", "00100", "00100", "00100", "01110"],
    "2": ["01110", "10001", "00001", "00110", "01000", "10000", "11111"],
    "3": ["01110", "10001", "00001", "00110", "00001", "10001", "01110"],
    "4": ["00010", "00110", "01010", "10010", "11111", "00010", "00010"],
    "5": ["11111", "10000", "11110", "00001", "00001", "10001", "01110"],
    "6": ["01110", "10000", "10000", "11110", "10001", "10001", "01110"],
    "7": ["11111", "00001", "00010", "00100", "01000", "01000", "01000"],
    "8": ["01110", "10001", "10001", "01110", "10001", "10001", "01110"],
    "9": ["01110", "10001", "10001", "01111", "00001", "00001", "01110"],
    ".": ["00000", "00000", "00000", "00000", "00000", "01100", "01100"],
    "-": ["00000", "00000", "00000", "11111", "00000", "00000", "00000"],
    "+": ["00000", "00100", "00100", "11111", "00100", "00100", "00000"],
    "e": ["00000", "00000", "01110", "10001", "11111", "10000", "01111"],
    " ": ["00000"] * 7,
}


def write_png(path: str, rgb: np.ndarray) -> None:
    """(h, w, 3) uint8 → 8-bit truecolor PNG via stdlib zlib/struct."""
    h, w, _ = rgb.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


class _Canvas:
    def __init__(self, w: int = 640, h: int = 400):
        self.w, self.h = w, h
        self.px = np.full((h, w, 3), 255, dtype=np.uint8)

    def line(self, x0, y0, x1, y1, color):
        n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
        xs = np.clip(np.linspace(x0, x1, n).round().astype(int), 0, self.w - 1)
        ys = np.clip(np.linspace(y0, y1, n).round().astype(int), 0, self.h - 1)
        self.px[ys, xs] = color

    def rect(self, x0, y0, x1, y1, color):
        x0, x1 = sorted((int(x0), int(x1)))
        y0, y1 = sorted((int(y0), int(y1)))
        self.px[max(y0, 0) : min(y1 + 1, self.h),
                max(x0, 0) : min(x1 + 1, self.w)] = color

    def text(self, x, y, s, color=(60, 60, 60)):
        cx = int(x)
        for ch in s:
            glyph = _FONT.get(ch, _FONT[" "])
            for r, rowbits in enumerate(glyph):
                for c, bit in enumerate(rowbits):
                    if bit == "1" and 0 <= cx + c < self.w and 0 <= y + r < self.h:
                        self.px[int(y) + r, cx + c] = color
            cx += 6


_SERIES = [(31, 119, 180), (214, 39, 40), (44, 160, 44), (148, 103, 189)]
_M = 48  # plot margin


def _fmt(v: float) -> str:
    s = f"{v:.3g}"
    return "".join(ch if ch in _FONT else " " for ch in s)


def _axes(cv: _Canvas, xlo, xhi, ylo, yhi):
    g = (160, 160, 160)
    cv.line(_M, cv.h - _M, cv.w - _M // 2, cv.h - _M, g)
    cv.line(_M, _M // 2, _M, cv.h - _M, g)
    for i in range(5):
        fx = i / 4
        x = _M + fx * (cv.w - 1.5 * _M)
        y = cv.h - _M - fx * (cv.h - 1.5 * _M)
        cv.line(x, cv.h - _M, x, cv.h - _M + 4, g)
        cv.line(_M - 4, y, _M, y, g)
        cv.text(x - 12, cv.h - _M + 7, _fmt(xlo + fx * (xhi - xlo)))
        cv.text(2, y - 3, _fmt(ylo + fx * (yhi - ylo)))


def _plot_series(
    path: str, series: list[list[tuple[float, float]]], logy: bool = False
) -> None:
    cv = _Canvas()
    pts = [
        (x, (log10(y) if logy else y))
        for s in series
        for x, y in s
        if not logy or y > 0
    ]
    if not pts:
        write_png(path, cv.px)
        return
    xs, ys = zip(*pts)
    xlo, xhi = min(xs), max(xs)
    ylo, yhi = min(ys), max(ys)
    if xhi == xlo:
        xhi = xlo + 1
    if yhi == ylo:
        yhi = ylo + 1
    _axes(cv, xlo, xhi, ylo, yhi)

    def tx(x):
        return _M + (x - xlo) / (xhi - xlo) * (cv.w - 1.5 * _M)

    def ty(y):
        return cv.h - _M - (y - ylo) / (yhi - ylo) * (cv.h - 1.5 * _M)

    for si, s in enumerate(series):
        color = _SERIES[si % len(_SERIES)]
        prev = None
        for x, y in s:
            if logy:
                if y <= 0:
                    prev = None
                    continue
                y = log10(y)
            if prev is not None:
                cv.line(tx(prev[0]), ty(prev[1]), tx(x), ty(y), color)
            prev = (x, y)
    write_png(path, cv.px)


def _svg(path, w, h, body, title):
    with open(path, "w") as f:
        f.write(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
            f'height="{h}" viewBox="0 0 {w} {h}" font-family="monospace" '
            f'font-size="11">\n<rect width="{w}" height="{h}" fill="white"/>'
            f'\n<text x="{w/2}" y="16" text-anchor="middle" '
            f'font-size="14">{title}</text>\n' + body + "\n</svg>\n"
        )


def _svg_series(path, series, names, title, xlabel, ylabel, logy=False):
    W, H = 640, 400
    pts = [
        (x, (log10(y) if logy else y))
        for s in series
        for x, y in s
        if not logy or y > 0
    ]
    if not pts:
        _svg(path, W, H, "", title)
        return
    xs, ys = zip(*pts)
    xlo, xhi = min(xs), max(xs)
    ylo, yhi = min(ys), max(ys)
    xhi = xhi if xhi > xlo else xlo + 1
    yhi = yhi if yhi > ylo else ylo + 1
    tx = lambda x: _M + (x - xlo) / (xhi - xlo) * (W - 1.5 * _M)  # noqa: E731
    ty = lambda y: H - _M - (y - ylo) / (yhi - ylo) * (H - 1.5 * _M)  # noqa: E731
    parts = [
        f'<line x1="{_M}" y1="{H-_M}" x2="{W-_M//2}" y2="{H-_M}" stroke="#999"/>',
        f'<line x1="{_M}" y1="{_M//2}" x2="{_M}" y2="{H-_M}" stroke="#999"/>',
        f'<text x="{W/2}" y="{H-8}" text-anchor="middle">{xlabel}</text>',
        f'<text x="12" y="{H/2}" text-anchor="middle" '
        f'transform="rotate(-90 12 {H/2})">{ylabel}</text>',
    ]
    for i in range(5):
        fx = i / 4
        xv = xlo + fx * (xhi - xlo)
        yv = ylo + fx * (yhi - ylo)
        parts.append(
            f'<text x="{tx(xv)}" y="{H-_M+16}" text-anchor="middle">'
            f"{xv:.3g}</text>"
        )
        lbl = f"1e{yv:.2f}" if logy else f"{yv:.3g}"
        parts.append(
            f'<text x="{_M-6}" y="{ty(yv)+4}" text-anchor="end">{lbl}</text>'
        )
    for si, (s, name) in enumerate(zip(series, names)):
        c = "#%02x%02x%02x" % _SERIES[si % len(_SERIES)]
        path_pts = " ".join(
            f"{tx(x):.1f},{ty(log10(y) if logy else y):.1f}"
            for x, y in s
            if not logy or y > 0
        )
        parts.append(
            f'<polyline points="{path_pts}" fill="none" stroke="{c}" '
            f'stroke-width="1.5"/>'
        )
        parts.append(
            f'<text x="{W-_M-120}" y="{_M+14*si}" fill="{c}">{name}</text>'
        )
    _svg(path, W, H, "\n".join(parts), title)


# ------------------------------------------------------------------ sinks


def convergence_plot(metrics: list[dict], out_prefix: str) -> list[str]:
    """Per-iteration L1 + max-error curves (log y), one SVG + one PNG —
    visualize_pagerank.py:46-69's two-panel convergence figure."""
    l1 = [(m["iteration"], m["l1"]) for m in metrics]
    mx = [(m["iteration"], m["max_err"]) for m in metrics]
    svg, png = out_prefix + ".svg", out_prefix + ".png"
    _svg_series(
        svg, [l1, mx], ["l1", "max_err"],
        "PageRank convergence", "iteration", "log10(error)", logy=True,
    )
    _plot_series(png, [l1, mx], logy=True)
    return [svg, png]


def top_ranked_plot(
    rows: list[tuple[int, float]], out_prefix: str
) -> list[str]:
    """Horizontal top-k rank bars (visualize_pagerank.py:135-167). ``rows``
    = collected (id, rank), highest first."""
    W, H = 640, max(160, 28 * len(rows) + 2 * _M)
    rmax = max((r for _, r in rows), default=1.0) or 1.0
    parts = []
    cv = _Canvas(W, H)
    for i, (vid, rank) in enumerate(rows):
        y = _M + i * 28
        bw = (W - 2.5 * _M) * rank / rmax
        c = _SERIES[0]
        parts.append(
            f'<rect x="{1.5*_M}" y="{y}" width="{bw:.1f}" height="20" '
            f'fill="#4e79c4"/>'
            f'<text x="{1.5*_M-6}" y="{y+14}" text-anchor="end">{vid}</text>'
            f'<text x="{1.5*_M+bw+4}" y="{y+14}">{rank:.6f}</text>'
        )
        cv.rect(1.5 * _M, y, 1.5 * _M + bw, y + 20, c)
        cv.text(4, y + 7, _fmt(float(vid)))
    svg, png = out_prefix + ".svg", out_prefix + ".png"
    _svg(svg, W, H, "\n".join(parts), "Top ranked vertices")
    write_png(png, cv.px)
    return [svg, png]


def rank_distribution_plot(
    bins: list[tuple[float, float, int]], out_prefix: str
) -> list[str]:
    """Histogram of the rank distribution (visualize_pagerank.py:169-204):
    ``bins`` = collected (lo, hi, num_vertices) from stats.rank_histogram."""
    W, H = 640, 400
    nmax = max((n for _, _, n in bins), default=1) or 1
    lo = min((b[0] for b in bins), default=0.0)
    hi = max((b[1] for b in bins), default=1.0)
    span = (hi - lo) or 1.0
    cv = _Canvas(W, H)
    parts = []
    for blo, bhi, n in bins:
        x0 = _M + (blo - lo) / span * (W - 1.5 * _M)
        x1 = _M + (bhi - lo) / span * (W - 1.5 * _M)
        y0 = H - _M - (n / nmax) * (H - 1.5 * _M)
        parts.append(
            f'<rect x="{x0:.1f}" y="{y0:.1f}" width="{max(x1-x0-1,1):.1f}" '
            f'height="{H-_M-y0:.1f}" fill="#4e79c4"/>'
        )
        cv.rect(x0, y0, max(x1 - 1, x0 + 1), H - _M, _SERIES[0])
    parts.append(
        f'<text x="{W/2}" y="{H-8}" text-anchor="middle">rank</text>'
    )
    cv.text(_M, H - _M + 7, _fmt(lo))
    cv.text(W - 2 * _M, H - _M + 7, _fmt(hi))
    svg, png = out_prefix + ".svg", out_prefix + ".png"
    _svg(svg, W, H, "\n".join(parts), "Rank distribution")
    write_png(png, cv.px)
    return [svg, png]
