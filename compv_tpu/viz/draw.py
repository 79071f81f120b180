"""Numpy rasterizers for detector/matcher/SLAM results.

Equivalents of the reference's canvas interface (CompVCanvasInterface:
drawLines/drawPoints/drawInterestPoints/drawMatches,
base/include/compv/base/drawing/compv_canvas.h) rendered on host into
(H, W, 3) uint8 arrays instead of a GL surface.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

GREEN = (40, 220, 70)
RED = (230, 60, 50)
YELLOW = (240, 200, 40)
BLUE = (60, 120, 235)


def to_rgb(img) -> np.ndarray:
    """Any gray/RGB array -> (H, W, 3) uint8 canvas copy."""
    a = np.asarray(img)
    if a.ndim == 2:
        a = np.stack([a] * 3, -1)
    return np.ascontiguousarray(a[..., :3], np.uint8).copy()


def _clip_disk(canvas, x, y, r, color):
    h, w = canvas.shape[:2]
    x0, x1 = max(0, x - r), min(w, x + r + 1)
    y0, y1 = max(0, y - r), min(h, y + r + 1)
    if x0 >= x1 or y0 >= y1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (yy - y) ** 2 + (xx - x) ** 2 <= r * r
    canvas[y0:y1, x0:x1][m] = color


def draw_points(img, xy, valid=None, color=GREEN, radius: int = 2
                ) -> np.ndarray:
    """Interest points as filled disks (reference drawInterestPoints)."""
    canvas = to_rgb(img)
    xy = np.asarray(xy)
    n = xy.shape[0]
    v = np.ones(n, bool) if valid is None else np.asarray(valid)
    for i in range(n):
        if v[i]:
            _clip_disk(canvas, int(round(xy[i, 0])), int(round(xy[i, 1])),
                       radius, color)
    return canvas


def _line_px(x0, y0, x1, y1):
    """Integer pixel coordinates along a segment (dense parametric walk)."""
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) + 1
    t = np.linspace(0.0, 1.0, n)
    xs = np.round(x0 + (x1 - x0) * t).astype(int)
    ys = np.round(y0 + (y1 - y0) * t).astype(int)
    return xs, ys


def draw_lines(img, segments, color=YELLOW, thickness: int = 1) -> np.ndarray:
    """Segments (N, 4) [x0, y0, x1, y1] (reference drawLines)."""
    canvas = to_rgb(img)
    h, w = canvas.shape[:2]
    for x0, y0, x1, y1 in np.asarray(segments, np.float64):
        xs, ys = _line_px(x0, y0, x1, y1)
        for dy in range(-(thickness // 2), thickness // 2 + 1):
            for dx in range(-(thickness // 2), thickness // 2 + 1):
                xc = np.clip(xs + dx, 0, w - 1)
                yc = np.clip(ys + dy, 0, h - 1)
                canvas[yc, xc] = color
    return canvas


def draw_boxes(img, boxes, color=BLUE, thickness: int = 1) -> np.ndarray:
    """Boxes (N, 4) [x0, y0, x1, y1] inclusive (e.g. CCL/MSER output)."""
    segs = []
    for x0, y0, x1, y1 in np.asarray(boxes, np.float64):
        segs += [(x0, y0, x1, y0), (x1, y0, x1, y1),
                 (x1, y1, x0, y1), (x0, y1, x0, y0)]
    return draw_lines(img, segs, color=color, thickness=thickness)


def draw_matches(img1, xy1, img2, xy2, train_idx, mask=None,
                 max_draw: int = 200) -> np.ndarray:
    """Side-by-side match rendering (reference matching surface layer,
    drawMatches): query image left, train image right, a line per match."""
    c1, c2 = to_rgb(img1), to_rgb(img2)
    h = max(c1.shape[0], c2.shape[0])
    w1 = c1.shape[1]
    canvas = np.zeros((h, w1 + c2.shape[1], 3), np.uint8)
    canvas[:c1.shape[0], :w1] = c1
    canvas[:c2.shape[0], w1:] = c2
    xy1 = np.asarray(xy1)
    xy2 = np.asarray(xy2)
    ti = np.asarray(train_idx).reshape(-1)
    n = min(len(ti), xy1.shape[0])
    m = np.ones(n, bool) if mask is None else np.asarray(mask)[:n]
    drawn = 0
    for i in range(n):
        if not m[i]:
            continue
        if drawn >= max_draw:
            break
        x0, y0 = xy1[i]
        x1, y1 = xy2[ti[i]]
        xs, ys = _line_px(x0, y0, x1 + w1, y1)
        ok = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < canvas.shape[1])
        canvas[ys[ok], xs[ok]] = GREEN
        _clip_disk(canvas, int(round(x0)), int(round(y0)), 2, RED)
        _clip_disk(canvas, int(round(x1 + w1)), int(round(y1)), 2, RED)
        drawn += 1
    return canvas


# minimal 5x7 bitmap glyphs for labels (reference drawTexts uses freetype +
# GL; result-annotation only needs digits/letters/punctuation)
_GLYPHS = {
    "0": "01110 10001 10011 10101 11001 10001 01110",
    "1": "00100 01100 00100 00100 00100 00100 01110",
    "2": "01110 10001 00001 00010 00100 01000 11111",
    "3": "11110 00001 00001 01110 00001 00001 11110",
    "4": "00010 00110 01010 10010 11111 00010 00010",
    "5": "11111 10000 11110 00001 00001 10001 01110",
    "6": "00110 01000 10000 11110 10001 10001 01110",
    "7": "11111 00001 00010 00100 01000 01000 01000",
    "8": "01110 10001 10001 01110 10001 10001 01110",
    "9": "01110 10001 10001 01111 00001 00010 01100",
    ".": "00000 00000 00000 00000 00000 00110 00110",
    "-": "00000 00000 00000 11111 00000 00000 00000",
    ":": "00000 00110 00110 00000 00110 00110 00000",
    " ": "00000 00000 00000 00000 00000 00000 00000",
    "x": "00000 00000 10001 01010 00100 01010 10001",
    "f": "00110 01000 01000 11100 01000 01000 01000",
    "p": "00000 00000 11110 10001 11110 10000 10000",
    "s": "00000 00000 01111 10000 01110 00001 11110",
    "m": "00000 00000 11010 10101 10101 10101 10101",
}


def draw_text(img, text: str, x: int, y: int, color=GREEN,
              scale: int = 1) -> np.ndarray:
    """Rasterize a small label at (x, y) top-left (reference drawTexts)."""
    canvas = to_rgb(img)
    h, w = canvas.shape[:2]
    cx = x
    for ch in str(text):
        rows = _GLYPHS.get(ch, _GLYPHS[" "]).split()
        for gy, row in enumerate(rows):
            for gx, bit in enumerate(row):
                if bit == "1":
                    y0 = y + gy * scale
                    x0 = cx + gx * scale
                    canvas[max(0, y0):min(h, y0 + scale),
                           max(0, x0):min(w, x0 + scale)] = color
        cx += 6 * scale
    return canvas


def draw_trajectory(positions, size: int = 512, margin: int = 24,
                    gt: Optional[np.ndarray] = None) -> np.ndarray:
    """Top-down (x, z) trajectory plot as an image (SLAM inspection)."""
    p = np.asarray(positions, np.float64)[:, [0, 2]]
    allp = p if gt is None else np.concatenate([p, np.asarray(gt)[:, [0, 2]]])
    lo = allp.min(0)
    span = np.maximum(allp.max(0) - lo, 1e-9)
    scale = (size - 2 * margin) / span.max()

    def to_px(q):
        return margin + (q - lo) * scale

    canvas = np.full((size, size, 3), 255, np.uint8)
    if gt is not None:
        g = to_px(np.asarray(gt)[:, [0, 2]])
        segs = np.concatenate([g[:-1], g[1:]], 1)
        canvas = draw_lines(canvas, segs, color=(180, 180, 180), thickness=2)
    e = to_px(p)
    segs = np.concatenate([e[:-1], e[1:]], 1)
    canvas = draw_lines(canvas, segs, color=BLUE, thickness=2)
    return canvas
