"""Kernel-based Hough transform (KHT) for lines.

Re-design of core/features/hough/compv_core_feature_houghkht.cxx:207-1309
(Fernandes & Oliveira 2008): the reference chains edge pixels into strings
(linking_AppendixA), subdivides them into clusters, fits a line per cluster,
and votes an elliptical-Gaussian kernel per cluster into the (rho, theta)
accumulator, thresholding with a global scale GS.

TPU formulation — same three phases, each parallel:
  1. linking/clustering -> connected-component labeling of the edge map
     batched tile-local label propagation + per-cluster moment sums as
     factored-indicator matmuls (ops/binsum.py) — scatter-free;
  2. per-cluster line fit -> eigen of the 2x2 scatter matrix (closed form);
     the fit quality (eigenvalue ratio) gives the kernel's angular/radial
     spread exactly as the KHT variances do;
  3. voting -> each cluster splats a separable Gaussian over a (rho, theta)
     window, weighted by cluster size — a dense batched outer-product add
     instead of the reference's per-cell scanline walk.
Then the same NMS + threshold + top-k postlude as SHT. The `gs` (global
scale) output mirrors the caps-exposed GS the calibrator uses for adaptive
thresholds (calib_camera.cxx:170-174).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HoughConfig
from ..core.registry import register
from .hough_sht import HoughLines, select_peaks


def _tile_local_label(binary: jax.Array, tile: int, ty: int, tx: int,
                      iters: int) -> jax.Array:
    """8-connected min-label propagation restricted to `tile`-sized tiles,
    computed in GLOBAL (H', W') layout with wall masks at tile borders.

    Round 2 ran this on a (B, 16, 16) batch layout — only 16 of the 128
    VPU lanes were active, and the convergence while_loop allowed up to
    128 iterations (the 1.9 ms KHT loss in BENCH_DETAIL round 3). Full-
    lane global layout with a fixed `iters` bound is ~4x cheaper; strings
    longer than `iters` propagation steps inside one tile are snake-
    shaped (a straight string crosses a 16px tile in <= 16 steps) and
    stay split — they were never line-vote material anyway.

    Labels are piece ids  tile_id * tile^2 + local_linear_index  of each
    piece's minimum member; background = ty*tx*tile^2."""
    hh, ww = ty * tile, tx * tile
    fg = binary[:hh, :ww] > 0
    big = jnp.int32(ty * tx * tile * tile)
    gy = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1)
    tile_id = (gy // tile) * tx + (gx // tile)
    lbl0 = jnp.where(fg, tile_id * (tile * tile)
                     + (gy % tile) * tile + (gx % tile), big)

    from ..kernels.dispatch import pallas_enabled
    from ..kernels.kht_label import tile_label_pallas, _BAND
    if pallas_enabled() and _BAND % tile == 0:
        # all `iters` propagation passes on a VMEM band in ONE HBM pass
        # (kernels/kht_label.py) — the fori_loop below re-reads the frame
        # per iteration (~0.49 ms of the 1.19 ms KHT row, 2026-08-20)
        return tile_label_pallas(lbl0, iters, tile,
                                 int(ty * tx * tile * tile))
    ly = gy % tile
    lx = gx % tile
    walls = {}
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if (dy, dx) == (0, 0):
                continue
            ok = jnp.ones((hh, ww), bool)
            if dy == 1:
                ok &= ly < tile - 1
            if dy == -1:
                ok &= ly > 0
            if dx == 1:
                ok &= lx < tile - 1
            if dx == -1:
                ok &= lx > 0
            walls[(dy, dx)] = ok

    def step(_, lbl):
        # share column shifts across the three rows of each neighbor col
        cols = {dx: (jnp.roll(lbl, -dx, axis=1) if dx else lbl)
                for dx in (-1, 0, 1)}
        m = lbl
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                t = (jnp.roll(cols[dx], -dy, axis=0) if dy else cols[dx])
                m = jnp.minimum(m, jnp.where(walls[(dy, dx)], t, big))
        return jnp.where(fg, m, big)

    return jax.lax.fori_loop(0, iters, step, lbl0)


def cluster_statistics(binary: jax.Array, max_clusters: int = 512,
                       tile: int = 16, label_iters: int | None = None):
    """Tile-subdivided edge-string pieces + per-piece first/second moments.

    Returns (count (C,), mean (C,2), cov (C,2,2), valid (C,)).

    Per-piece moments are batched factored-indicator binsums
    (ops/binsum.py) on the MXU. (A batched 256-wide lax.sort + fused
    segmented-scan variant was tried in round 3 and measured 5x SLOWER
    on-chip — many small sorts are an XLA-TPU weak spot; the binsum
    indicators are the cheaper evil.)
    Moments accumulate in tile-LOCAL coordinates (values < tile^2 — exact
    in f32; global x^2 sums lose the covariance to cancellation) and
    means shift back by the tile offset, under which the covariance is
    invariant.  Piece selection reuses the FAST sort-free cutoff top-k on
    the (B, tile^2) per-piece count grid.  `label_iters` defaults to
    tile-1: a straight string crosses a `tile`-px tile in <= tile-1
    8-connected steps, so every straight in-tile string converges to one
    piece (12 iterations left the last ~3 px of a 16-px string as a
    sub-4-px pseudo-piece the count>=4 filter silently dropped — round-3
    advisor finding).  Curvier in-tile strings that still end up split,
    and cross-tile fragments, are re-joined AFTER selection by
    merge_collinear_pieces."""
    from .fast import _cutoff_select, _pack_key  # sort-free exact top-k
    if label_iters is None:
        label_iters = tile - 1
    h, w = binary.shape
    ty, tx = h // tile, w // tile
    b = ty * tx
    tt = tile * tile
    if b == 0:                      # image thinner than one tile: no pieces
        z = jnp.zeros((max_clusters,), jnp.float32)
        return (z, jnp.zeros((max_clusters, 2), jnp.float32),
                jnp.zeros((max_clusters, 2, 2), jnp.float32), z > 0)
    lbl = _tile_local_label(binary, tile, ty, tx, label_iters)
    from ..kernels.dispatch import pallas_enabled
    from ..kernels import run_compact as rc
    if pallas_enabled() and b > 0 and rc.pack_fits(ty * tile, tx * tile):
        return _piece_stats_runs(lbl, b, tt, tile, tx, max_clusters)
    lab = lbl.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3) \
        .reshape(b, tt)
    lab = jnp.where(lab < b * tt, lab % tt, tt)   # local ids; bg -> tt
    from ..ops import binsum
    xl = jnp.broadcast_to(
        jnp.arange(tile, dtype=jnp.float32)[None, None, :],
        (b, tile, tile)).reshape(b, tt)
    yl = jnp.broadcast_to(
        jnp.arange(tile, dtype=jnp.float32)[None, :, None],
        (b, tile, tile)).reshape(b, tt)
    cnt = binsum.bincount_batched(lab, tt).astype(jnp.float32)
    sx = binsum.bincount_batched(lab, tt, xl)
    sy = binsum.bincount_batched(lab, tt, yl)
    sxx = binsum.bincount_batched(lab, tt, xl * xl)
    sxy = binsum.bincount_batched(lab, tt, xl * yl)
    syy = binsum.bincount_batched(lab, tt, yl * yl)
    count_grid = cnt

    # top-K pieces by pixel count (counts clamp to 255 for the cutoff
    # search; exact stats are re-read at the K selected slots)
    assert b * tt < (1 << 22), (
        "piece grid exceeds the 22-bit packed-key index space "
        f"({b}x{tt}); raise `tile` for >4K inputs")
    cnt_u8 = jnp.clip(count_grid, 0, 255).astype(jnp.uint8)
    keys = _cutoff_select(cnt_u8, max_clusters)
    sel = (keys & ((1 << 22) - 1)).astype(jnp.int32)
    picked = keys != _pack_key(jnp.int32(0), jnp.int32((1 << 22) - 1))
    bi = jnp.minimum(sel // tt, b - 1)
    si = sel % tt
    top_cnt = jnp.where(picked, count_grid[bi, si], 0.0)
    c = jnp.maximum(top_cnt, 1.0)
    offx = (bi % tx).astype(jnp.float32) * tile
    offy = (bi // tx).astype(jnp.float32) * tile
    mx_l = sx[bi, si] / c
    my_l = sy[bi, si] / c
    cxx = sxx[bi, si] / c - mx_l * mx_l
    cyy = syy[bi, si] / c - my_l * my_l
    cxy = sxy[bi, si] / c - mx_l * my_l
    cov = jnp.stack([jnp.stack([cxx, cxy], -1),
                     jnp.stack([cxy, cyy], -1)], -2)
    mean = jnp.stack([mx_l + offx, my_l + offy], -1)
    return top_cnt, mean, cov, top_cnt >= 4.0


def _piece_stats_runs(lbl, b, tt, tile, tx, max_clusters,
                      max_runs: int = 65536):
    """Per-piece count/mean/cov on the Pallas path, via the CCL run-table
    machinery instead of batched one-hot binsums.

    The binsum formulation materializes (B, tt, tt) one-hot indicators —
    ~944 MB of HBM traffic at HD (measured 1.07 ms of the 1.95 ms KHT
    round-4 loss). Runs split at LABEL changes (kernels/run_compact.py),
    so every run lies inside one tile of one piece; per-run moments are
    closed-form from the endpoints in tile-LOCAL coordinates (exact in
    f32 — global x^2 sums lose the covariance to cancellation) and one
    segmented scan (kernels/seg_scan.py) aggregates them per piece. Tie
    order of the top-K by count matches the binsum path: piece label
    order == (tile, local-id) grid order. Edge maps with more than
    `max_runs` runs (>7% density at HD; Canny output is ~2-5%) lose
    their highest-label runs silently."""
    from ..kernels.run_compact import run_table_compact
    from .ccl import _seg_scan_multi
    hh, ww = lbl.shape
    big = b * tt
    wp = -(-(ww + 1) // 128) * 128
    lbl_p = jnp.pad(lbl, ((0, 0), (0, wp - ww)), constant_values=big)
    g_root, g_s, g_ln, _ = run_table_compact(
        lbl_p, big, ww, wp, min(max_runs, hh * ww))
    rv = g_root < big
    y = g_s // ww
    x0 = g_s - y * ww
    yl = jnp.where(rv, (y % tile).astype(jnp.float32), 0.0)
    xl0 = jnp.where(rv, (x0 % tile).astype(jnp.float32), 0.0)
    lnf = jnp.where(rv, g_ln, 0).astype(jnp.float32)
    xl1 = jnp.where(rv, xl0 + lnf - 1.0, 0.0)
    sumx = jnp.where(rv, (xl0 + xl1) * lnf * 0.5, 0.0)
    s2 = lambda v: v * (v + 1.0) * (2.0 * v + 1.0) / 6.0
    sumxx = jnp.where(rv, s2(xl1) - s2(xl0 - 1.0), 0.0)
    new = jnp.concatenate([jnp.ones((1,), bool),
                           g_root[1:] != g_root[:-1]])
    area, sx, sy, sxx, sxy, syy = _seg_scan_multi(
        sums=(lnf, sumx, yl * lnf, sumxx, yl * sumx, yl * yl * lnf),
        mins=(), maxs=(), new=new)
    is_end = jnp.concatenate([new[1:], jnp.ones((1,), bool)]) & rv
    key = jnp.where(is_end, area, 0.0)
    k = min(max_clusters, key.shape[0])
    # sort-free top-K on counts clamped to 255 — the same clamp + index
    # tie order as the binsum path's _cutoff_select (piece areas <= 256:
    # only a full-tile piece ever hits the clamp), so the two dispatch
    # paths select and order identically; exact counts re-read below
    from .fast import cutoff_topk_flat
    picked, pos = cutoff_topk_flat(
        jnp.minimum(key, 255.0).astype(jnp.uint8), k)
    top_cnt = jnp.where(picked, key[pos], 0.0)
    if k < max_clusters:
        top_cnt = jnp.pad(top_cnt, (0, max_clusters - k))
        pos = jnp.pad(pos, (0, max_clusters - k))
        picked = jnp.pad(picked, (0, max_clusters - k))
    roots = g_root[pos]
    tile_id = jnp.where(picked, roots, 0) // tt
    offx = (tile_id % tx).astype(jnp.float32) * tile
    offy = (tile_id // tx).astype(jnp.float32) * tile
    c = jnp.maximum(top_cnt, 1.0)
    mx_l = sx[pos] / c
    my_l = sy[pos] / c
    cxx = sxx[pos] / c - mx_l * mx_l
    cyy = syy[pos] / c - my_l * my_l
    cxy = sxy[pos] / c - mx_l * my_l
    cov = jnp.stack([jnp.stack([cxx, cxy], -1),
                     jnp.stack([cxy, cyy], -1)], -2)
    mean = jnp.stack([jnp.where(picked, mx_l + offx, 0.0),
                      jnp.where(picked, my_l + offy, 0.0)], -1)
    return top_cnt, mean, cov, top_cnt >= 4.0


def merge_collinear_pieces(cnt, mean, cov, valid, tol: float = 1.5,
                           theta_tol: float = 0.15):
    """Merge mutually-collinear tile pieces into one voting cluster
    (round-2 VERDICT item 6 — the reference chains strings globally
    before subdividing, houghkht.cxx:207+; tile subdivision must not make
    one straight string vote as many independent noisy clusters).

    Merge relation: each piece's mean lies within `tol` px of the other
    piece's fitted line (both directions) AND line normals agree within
    `theta_tol` — then transitive closure. Pixel connectivity is
    deliberately NOT required: collinear pieces vote the same (rho,theta)
    accumulator cell whether or not they touch (a dashed line IS one
    Hough line), so merging them only sharpens the shared estimate, while
    parallel-but-distinct strings farther than `tol` apart never merge.
    Gently curved strings chain into one low-anisotropy cluster, which
    the anisotropy weighting already down-weights, mirroring the
    reference's variance-spread kernels. Merged moments combine in
    deviation form (parallel-axis) to stay exact in f32. Returns
    (cnt', mean', cov', valid') where only each group's representative
    stays valid, carrying the group totals."""
    k = cnt.shape[0]
    rho, theta, _, _ = jax.vmap(_line_from_moments)(mean, cov)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    d_ij = jnp.abs(ct[:, None] * mean[None, :, 0]
                   + st[:, None] * mean[None, :, 1] - rho[:, None])
    dth = jnp.abs(theta[:, None] - theta[None, :])
    dth = jnp.minimum(dth, jnp.pi - dth)
    vv = valid[:, None] & valid[None, :]
    adj = vv & (d_ij < tol) & (d_ij.T < tol) & (dth < theta_tol)
    adj = adj | jnp.eye(k, dtype=bool)
    a = adj.astype(jnp.float32)
    for _ in range(3):                 # transitive closure (paths <= 8)
        a = jnp.minimum(a @ a, 1.0)
    idxs = jnp.arange(k, dtype=jnp.int32)
    rep = jnp.min(jnp.where(a > 0, idxs[None, :], k), axis=1)
    is_rep = rep == idxs
    n_m = a @ cnt
    safe_n = jnp.maximum(n_m, 1.0)
    mean_m = (a @ (cnt[:, None] * mean)) / safe_n[:, None]
    dev = mean - mean_m                # per piece, valid for its group
    dev4 = (dev[:, :, None] * dev[:, None, :]).reshape(k, 4)
    contrib = cnt[:, None] * (cov.reshape(k, 4) + dev4)
    cov_m = ((a @ contrib) / safe_n[:, None]).reshape(k, 2, 2)
    return (jnp.where(is_rep, n_m, 0.0), mean_m, cov_m,
            valid & is_rep & (n_m >= 4.0))


def _line_from_moments(mean, cov):
    """Principal direction of a 2x2 scatter -> (rho, theta, anisotropy).
    theta is the line normal's angle in [0, pi)."""
    a, b, d = cov[0, 0], cov[0, 1], cov[1, 1]
    # eigen of [[a,b],[b,d]]: principal direction angle phi of the LINE
    phi = 0.5 * jnp.arctan2(2.0 * b, a - d)
    # normal angle
    theta = phi + jnp.pi / 2.0
    theta = jnp.where(theta >= jnp.pi, theta - jnp.pi, theta)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)
    rho = mean[0] * jnp.cos(theta) + mean[1] * jnp.sin(theta)
    # flip so rho >= 0 convention not required; keep as-is
    tr = a + d
    det = a * d - b * b
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
    lam_max = tr / 2.0 + disc
    lam_min = jnp.maximum(tr / 2.0 - disc, 1e-3)
    return rho, theta, lam_max / lam_min, lam_min


@functools.partial(jax.jit, static_argnames=("config", "max_clusters",
                                             "kernel_radius"))
def hough_lines_kht(edges: jax.Array, config: HoughConfig = HoughConfig(),
                    max_clusters: int = 256,
                    kernel_radius: int = 4) -> Tuple[HoughLines, jax.Array]:
    """KHT line detection on a binary edge map. Returns (lines, gs) where gs
    is the max accumulator value (the reference's global scale)."""
    h, w = edges.shape
    diag = float(np.hypot(h, w))
    n_rho = int(2 * np.ceil(diag / config.rho)) + 1
    n_theta = config.theta_steps
    cnt, mean, cov, valid = cluster_statistics(edges, max_clusters)
    cnt, mean, cov, valid = merge_collinear_pieces(cnt, mean, cov, valid)

    rho, theta, aniso, lam_min = jax.vmap(_line_from_moments)(mean, cov)
    # straighter clusters (higher anisotropy) vote more sharply & strongly
    weight = cnt * jnp.clip(aniso / (aniso + 10.0), 0.05, 1.0) * valid
    sigma_rho = jnp.clip(jnp.sqrt(lam_min) + 0.5, 0.5, 4.0)
    sigma_theta_bins = jnp.clip(
        (n_theta / np.pi) / jnp.sqrt(jnp.maximum(cnt, 2.0)), 0.5, 8.0)

    rho_center = rho / config.rho + (n_rho // 2)
    theta_center = theta * (n_theta / np.pi)

    # splat separable Gaussian windows: (C, K, K) values at integer offsets
    offs = jnp.arange(-kernel_radius, kernel_radius + 1, dtype=jnp.float32)
    r_idx = jnp.round(rho_center[:, None]) + offs[None, :]        # (C, K)
    t_idx = jnp.round(theta_center[:, None]) + offs[None, :]
    g_r = jnp.exp(-0.5 * ((r_idx - rho_center[:, None]) / sigma_rho[:, None]) ** 2)
    g_t = jnp.exp(-0.5 * ((t_idx - theta_center[:, None])
                          / sigma_theta_bins[:, None]) ** 2)
    votes = weight[:, None, None] * g_r[:, :, None] * g_t[:, None, :]  # (C,K,K)
    r_i = jnp.clip(r_idx.astype(jnp.int32), 0, n_rho - 1)
    t_i = (t_idx.astype(jnp.int32)) % n_theta
    seg = (r_i[:, :, None] * n_theta + t_i[:, None, :]).reshape(-1)
    acc = jax.ops.segment_sum(votes.reshape(-1), seg,
                              num_segments=n_rho * n_theta)
    acc = acc.reshape(n_rho, n_theta)
    gs = jnp.max(acc)

    pad = jnp.pad(acc, 1)
    neigh = [jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (n_rho, n_theta))
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    nmax = functools.reduce(jnp.maximum, neigh)
    acc_nms = jnp.where((acc >= nmax) & (acc >= config.threshold), acc, 0.0)

    vals, idx = select_peaks(acc_nms, config.max_lines)
    line_valid = vals > 0
    r_sel = idx // n_theta
    t_sel = idx % n_theta
    lines = HoughLines(
        rho=(r_sel - n_rho // 2).astype(jnp.float32) * config.rho,
        theta=t_sel.astype(jnp.float32) * (np.pi / n_theta),
        strength=vals.astype(jnp.int32),
        count=jnp.sum(line_valid).astype(jnp.int32),
    )
    return lines, gs


def filter_lines_by_gs(lines: HoughLines, gs, frac: float = 0.1
                       ) -> jax.Array:
    """(M,) bool mask of lines with strength >= frac * GS — the adaptive
    threshold the reference calibrator applies to KHT output via the caps
    system (calib_camera.cxx:170-188, COMPV_HOUGHKHT_SET_FLT32_GS)."""
    return (lines.strength.astype(jnp.float32) >= frac * gs) \
        & (jnp.arange(lines.rho.shape[0]) < lines.count)


@register("hough", "kht")
def make_hough_kht(config: HoughConfig = HoughConfig()):
    """Factory (reference COMPV_HOUGHKHT_ID)."""

    def run(edges: jax.Array):
        return hough_lines_kht(edges, config)

    return run
