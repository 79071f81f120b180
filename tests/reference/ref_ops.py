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


# ---- round-3 oracle extensions (round-2 VERDICT item 4) -------------------
# Independent NumPy formulations of every remaining integer-exact kernel,
# mirroring the reference's scalar-C++-vs-ASM sweep (unittests/main.cxx:
# 89-94). Fixed-point coefficients transcribed from the reference tables.


def rgb_to_yuv444(rgb: np.ndarray):
    """Reference fixed-point RGB->YUV444 (compv_image_conv_rgbfamily.cxx:
    108: Y=((33R+65G+13B)>>7)+16; :26-37: U=((-38R-74G+112B)>>8)+128,
    V=((112R-94G-18B)>>8)+128, clamped to u8)."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    y = ((33 * r + 65 * g + 13 * b) >> 7) + 16
    u = ((-38 * r - 74 * g + 112 * b) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b) >> 8) + 128
    c = lambda p: np.clip(p, 0, 255).astype(np.uint8)
    return c(y), c(u), c(v)


def yuv444_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Reference fixed-point YUV->RGB (compv_image_conv_to_rgbx.cxx:
    505-513: R=(37Y'+51V')>>5, G=(37Y'-13U'-26V')>>5, B=(37Y'+65U')>>5
    with Y'=Y-16, U'=U-128, V'=V-128, clamped)."""
    yp = (y.astype(np.int32) - 16) * 37
    up = u.astype(np.int32) - 128
    vp = v.astype(np.int32) - 128
    r = (yp + 51 * vp) >> 5
    g = (yp - 13 * up - 26 * vp) >> 5
    b = (yp + 65 * up) >> 5
    return np.clip(np.stack([r, g, b], -1), 0, 255).astype(np.uint8)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray):
    """420 chroma duplicated over 2x2 luma blocks (reference SIMD kernels'
    nearest siting), then the fixed-point YUV->RGB above."""
    up = np.repeat(np.repeat(u, 2, 0), 2, 1)[: y.shape[0], : y.shape[1]]
    vp = np.repeat(np.repeat(v, 2, 0), 2, 1)[: y.shape[0], : y.shape[1]]
    return yuv444_to_rgb(y, up, vp)


def _roundf(x):
    """C roundf: half away from zero (np.round is half-to-even)."""
    return np.floor(np.abs(x) + 0.5) * np.sign(x)


def rgb_to_hsv(rgb: np.ndarray) -> np.ndarray:
    """Reference HSV (compv_image_conv_hsv.cxx:289-306): H = u8(roundf(
    43*diff/minus)) + {0,85,171} (u8 wrap), S = u8(roundf(255*minus/max)),
    V = max; the 1/minus and 1/max factors come from float32 tables."""
    r = rgb[..., 0].astype(np.int32)
    g = rgb[..., 1].astype(np.int32)
    b = rgb[..., 2].astype(np.int32)
    maxv = np.maximum(r, np.maximum(g, b))
    minv = np.minimum(r, np.minimum(g, b))
    minus = maxv - minv
    diff = np.where(maxv == r, g - b, np.where(maxv == g, b - r, r - g))
    # live f32 division, matching ops/color.py (the reference's f32 LUT
    # values agree to 1 ulp; a per-pixel LUT gather is a TPU anti-pattern)
    inv_minus = np.where(
        minus > 0,
        np.float32(43.0) / np.maximum(minus, 1).astype(np.float32),
        np.float32(0.0)).astype(np.float32)
    inv_max = np.where(
        maxv > 0,
        np.float32(255.0) / np.maximum(maxv, 1).astype(np.float32),
        np.float32(0.0)).astype(np.float32)
    s43 = (diff.astype(np.float32) * inv_minus)
    s255 = (minus.astype(np.float32) * inv_max)
    offs = np.where(maxv == r, 0, np.where(maxv == g, 85, 171))
    h = (_roundf(s43).astype(np.int64) + offs).astype(np.uint8)
    s = _roundf(s255).astype(np.uint8)
    return np.stack([h, s, maxv.astype(np.uint8)], -1)


def erode(img: np.ndarray, strel: np.ndarray) -> np.ndarray:
    """Flat erosion, REPLICATE borders (reference CompVMathMorph)."""
    h, w = img.shape
    sh, sw = strel.shape
    ph, pw = sh // 2, sw // 2
    pad = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.full((h, w), 255, img.dtype)
    for dy in range(sh):
        for dx in range(sw):
            if strel[dy, dx]:
                out = np.minimum(out, pad[dy:dy + h, dx:dx + w])
    return out


def dilate(img: np.ndarray, strel: np.ndarray) -> np.ndarray:
    h, w = img.shape
    sh, sw = strel.shape
    ph, pw = sh // 2, sw // 2
    pad = np.pad(img, ((ph, ph), (pw, pw)), mode="edge")
    out = np.zeros((h, w), img.dtype)
    for dy in range(sh):
        for dx in range(sw):
            if strel[dy, dx]:
                out = np.maximum(out, pad[dy:dy + h, dx:dx + w])
    return out


def ccl_components(binary: np.ndarray, connectivity: int = 8):
    """Union-find CCL + per-component stats (reference PLSL result
    semantics, compv_core_ccl_lsl_result.cxx): returns a dict keyed by
    root (min linear index) with area, box (x0,y0,x1,y1 inclusive),
    centroid, moments [n, sx, sy, sxx, sxy, syy], and the per-row RUN
    list [(y, x0, x1, root)] in scan order."""
    h, w = binary.shape
    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    offs = [(-1, 0), (0, -1)]
    if connectivity == 8:
        offs += [(-1, -1), (-1, 1)]
    for y in range(h):
        for x in range(w):
            if not binary[y, x]:
                continue
            p = y * w + x
            parent.setdefault(p, p)
            for dy, dx in offs:
                yy, xx = y + dy, x + dx
                if 0 <= yy < h and 0 <= xx < w and binary[yy, xx]:
                    q = yy * w + xx
                    parent.setdefault(q, q)
                    union(p, q)
    comps = {}
    for y in range(h):
        for x in range(w):
            if not binary[y, x]:
                continue
            r = find(y * w + x)
            c = comps.setdefault(r, dict(area=0, x0=w, y0=h, x1=-1, y1=-1,
                                         sx=0, sy=0, sxx=0, sxy=0, syy=0))
            c["area"] += 1
            c["x0"] = min(c["x0"], x); c["x1"] = max(c["x1"], x)
            c["y0"] = min(c["y0"], y); c["y1"] = max(c["y1"], y)
            c["sx"] += x; c["sy"] += y
            c["sxx"] += x * x; c["sxy"] += x * y; c["syy"] += y * y
    runs = []
    for y in range(h):
        x = 0
        while x < w:
            if binary[y, x]:
                x0 = x
                while x < w and binary[y, x]:
                    x += 1
                runs.append((y, x0, x - 1, find(y * w + x0)))
            else:
                x += 1
    return comps, runs


def sht_accumulator(edges: np.ndarray, rho_step: float, n_theta: int):
    """Polar vote accumulator (houghsht.cxx:348 semantics as our SHT
    documents them): for each edge pixel and each theta bin,
    rho_idx = round((x cos + y sin) / rho_step) + n_rho//2; integer
    votes."""
    h, w = edges.shape
    diag = float(np.hypot(h, w))
    n_rho = int(2 * np.ceil(diag / rho_step)) + 1
    thetas = np.arange(n_theta, dtype=np.float32) * np.float32(np.pi / n_theta)
    acc = np.zeros((n_rho, n_theta), np.int32)
    ys, xs = np.nonzero(edges)
    for x, y in zip(xs, ys):
        rho = np.float32(x) * np.cos(thetas) + np.float32(y) * np.sin(thetas)
        ri = np.round(rho / rho_step).astype(np.int32) + n_rho // 2
        acc[np.clip(ri, 0, n_rho - 1), np.arange(n_theta)] += 1
    return acc


def hog_cell_histograms(img: np.ndarray, cell: int, nbins: int,
                        signed_grad: bool) -> np.ndarray:
    """Per-cell orientation histograms with linear bin interpolation
    (hog_std.cxx:104-745 semantics): 1-0-1 gradients (borders zero),
    magnitude votes split between the two nearest bins."""
    h, w = img.shape
    x = img.astype(np.float64)
    gx = np.zeros((h, w)); gy = np.zeros((h, w))
    gx[:, 1:-1] = x[:, 2:] - x[:, :-2]
    gy[1:-1, :] = x[2:, :] - x[:-2, :]
    mag = np.sqrt(gx * gx + gy * gy)
    period = 2 * np.pi if signed_grad else np.pi
    ang = np.arctan2(gy, gx)
    ang = np.where(ang < 0, ang + period, ang)
    ang = np.where(ang >= period, ang - period, ang)
    binf = ang * (nbins / period)
    b0 = np.floor(binf).astype(int) % nbins
    b1 = (b0 + 1) % nbins
    w1 = binf - np.floor(binf)
    ch, cw = h // cell, w // cell
    out = np.zeros((ch, cw, nbins))
    for y in range(ch * cell):
        for xx in range(cw * cell):
            cy, cx = y // cell, xx // cell
            out[cy, cx, b0[y, xx]] += mag[y, xx] * (1 - w1[y, xx])
            out[cy, cx, b1[y, xx]] += mag[y, xx] * w1[y, xx]
    return out


def brief_describe(img: np.ndarray, xy: np.ndarray, angles: np.ndarray,
                   pat_a: np.ndarray, pat_b: np.ndarray) -> np.ndarray:
    """Scalar rotated-BRIEF (compv_core_feature_orb_desc.cxx:216-264
    semantics as our brief.py documents them): per point, rotate the
    pattern by the point angle, sample with rounded+clipped coords,
    bit = A < B, little-endian pack to uint32[8]."""
    h, w = img.shape
    n = xy.shape[0]
    bits = pat_a.shape[0]
    out = np.zeros((n, bits // 32), np.uint32)
    for i in range(n):
        c, s = np.cos(angles[i]), np.sin(angles[i])
        for k in range(bits):
            rax = c * pat_a[k, 0] - s * pat_a[k, 1]
            ray = s * pat_a[k, 0] + c * pat_a[k, 1]
            rbx = c * pat_b[k, 0] - s * pat_b[k, 1]
            rby = s * pat_b[k, 0] + c * pat_b[k, 1]
            ax = min(max(int(np.floor(xy[i, 0] + rax + 0.5)), 0), w - 1)
            ay = min(max(int(np.floor(xy[i, 1] + ray + 0.5)), 0), h - 1)
            bx = min(max(int(np.floor(xy[i, 0] + rbx + 0.5)), 0), w - 1)
            by = min(max(int(np.floor(xy[i, 1] + rby + 0.5)), 0), h - 1)
            if img[ay, ax] < img[by, bx]:
                out[i, k // 32] |= np.uint32(1) << np.uint32(k % 32)
    return out
