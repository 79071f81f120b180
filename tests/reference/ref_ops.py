"""NumPy scalar-reference oracles for golden testing.

These mirror the reference's scalar C++ fallbacks (`*_C` functions) — the
"C fallback" analogue the CompV unittest sweep compares SIMD kernels against
(unittests/main.cxx:89-94). Each oracle is written independently in plain
NumPy from the documented semantics, and JAX ops must match it bit-for-bit
(integer paths) or to float tolerance.
"""
from __future__ import annotations

import numpy as np


def rgb_to_gray(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = ((33 * r + 65 * g + 13 * b) >> 7) + 16
    return np.clip(y, 0, 255).astype(np.uint8)


def resize_bilinear_u8(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Scalar port of the documented 8.8 fixed-point grid-walk semantics
    (see compv_tpu/ops/resize.py docstring)."""
    in_h, in_w = img.shape
    sf_x = int((in_w / out_w) * 255.0)
    sf_y = int((in_h / out_h) * 255.0)
    out = np.zeros((out_h, out_w), np.uint8)
    acc_y = 0
    for j in range(out_h):
        ny = min(acc_y >> 8, in_h - 1)
        y0 = acc_y & 0xFF
        y1 = 255 - y0
        ny1 = min(ny + 1, in_h - 1)
        acc_x = 0
        for i in range(out_w):
            nx = min(acc_x >> 8, in_w - 1)
            x0 = acc_x & 0xFF
            x1 = 255 - x0
            nx1 = min(nx + 1, in_w - 1)
            a = int(img[ny, nx]); b = int(img[ny, nx1])
            c = int(img[ny1, nx]); d = int(img[ny1, nx1])
            out[j, i] = ((y1 * (a * x1 + b * x0)) >> 16) + ((y0 * (c * x1 + d * x0)) >> 16)
            acc_x += sf_x
        acc_y += sf_y
    return out


def conv2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Zero-border dense correlation, float64."""
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    x = np.pad(img.astype(np.float64), ((ph, ph), (pw, pw)))
    h, w = img.shape
    out = np.zeros((h, w), np.float64)
    for dy in range(kh):
        for dx in range(kw):
            out += kernel[dy, dx] * x[dy:dy + h, dx:dx + w]
    return out


def fast_strengths(img: np.ndarray, threshold: int, n: int) -> np.ndarray:
    """Scalar FAST strengths map with the reference's semantics
    (fast_dete.cxx:658-770): for each pixel, over all 16 length-n arcs whose
    circle pixels are all darker than p-t (or all brighter than p+t),
    strength = max over arcs of (min over arc of saturated diff).
    """
    h, w = img.shape
    circle = [(0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
              (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3)]
    out = np.zeros((h, w), np.uint8)
    im = img.astype(np.int32)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            p = im[y, x]
            brighter = min(p + threshold, 255)
            darker = max(p - threshold, 0)
            vals = np.array([im[y + dy, x + dx] for dx, dy in circle])
            db = np.maximum(vals - brighter, 0)   # how much brighter
            dd = np.maximum(darker - vals, 0)     # how much darker
            strength = 0
            for diffs in (db, dd):
                on = diffs > 0
                if on.sum() < n:
                    continue
                ext = np.concatenate([on, on])
                dext = np.concatenate([diffs, diffs])
                for s in range(16):
                    if ext[s:s + n].all():
                        strength = max(strength, int(dext[s:s + n].min()))
            out[y, x] = strength
    return out


def fast_nms(strengths: np.ndarray) -> np.ndarray:
    """Reference NMS (fast_dete.cxx:773-815): suppress pixel if any of its
    8 neighbors has strength >= its own; only rows/cols in [3, dim-3)."""
    h, w = strengths.shape
    out = strengths.copy()
    s = strengths.astype(np.int32)
    for y in range(3, h - 3):
        for x in range(3, w - 3):
            v = s[y, x]
            if v == 0:
                continue
            neigh = [s[y, x - 1], s[y, x + 1], s[y - 1, x - 1], s[y - 1, x],
                     s[y - 1, x + 1], s[y + 1, x - 1], s[y + 1, x], s[y + 1, x + 1]]
            if max(neigh) >= v:
                out[y, x] = 0
    return out


def hamming_distance_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(Q, T) hamming distances between packed uint32 descriptor rows."""
    q = a.shape[0]
    t = b.shape[0]
    out = np.zeros((q, t), np.int32)
    for i in range(q):
        x = a[i][None, :] ^ b  # (T, words)
        out[i] = np.unpackbits(x.view(np.uint8), axis=1).sum(axis=1)
    return out


def otsu(img: np.ndarray) -> int:
    hist = np.bincount(img.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    best_t, best_v = 0, -1.0
    sum_all = (np.arange(256) * hist).sum()
    w0 = 0.0
    sum0 = 0.0
    for t in range(256):
        w0 += hist[t]
        sum0 += t * hist[t]
        w1 = total - w0
        if w0 == 0 or w1 == 0:
            continue
        mu0 = sum0 / w0
        mu1 = (sum_all - sum0) / w1
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best_v:
            best_v, best_t = v, t
    return best_t
