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
from ..ops import binsum
from .hough_sht import HoughLines, select_peaks


def _batched_label(tiles: jax.Array, max_iters: int) -> jax.Array:
    """8-connected min-label propagation over a batch of small tiles,
    (B, t, t) uint8 -> (B, t, t) int32 local labels (background = t*t).
    Rolls + wrap masks only — dynamic_slice forces relayout copies on TPU
    and a Pallas launch per tiny tile would be all overhead."""
    b, tt, _ = tiles.shape
    fg = tiles > 0
    big = jnp.int32(tt * tt)
    idx = jnp.arange(tt * tt, dtype=jnp.int32).reshape(tt, tt)
    lbl0 = jnp.where(fg, idx[None], big)
    rows = jnp.arange(tt)[None, :, None]
    cols = jnp.arange(tt)[None, None, :]

    def step(state):
        lbl, _, it = state
        m = lbl
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy, dx) == (0, 0):
                    continue
                t = jnp.roll(jnp.roll(lbl, -dy, axis=1), -dx, axis=2)
                ok = jnp.ones((1, tt, tt), bool)
                if dy == 1:
                    ok = ok & (rows < tt - 1)
                if dy == -1:
                    ok = ok & (rows > 0)
                if dx == 1:
                    ok = ok & (cols < tt - 1)
                if dx == -1:
                    ok = ok & (cols > 0)
                m = jnp.minimum(m, jnp.where(ok, t, big))
        new = jnp.where(fg, m, big)
        return new, jnp.any(new != lbl), it + 1

    def cond(state):
        return state[1] & (state[2] < max_iters)

    lbl, _, _ = jax.lax.while_loop(
        cond, step, (lbl0, jnp.asarray(True), jnp.asarray(0, jnp.int32)))
    return lbl


def cluster_statistics(binary: jax.Array, max_clusters: int = 512,
                       tile: int = 16):
    """Tile-subdivided clusters + per-cluster first/second moments.

    Returns (count (C,), mean (C,2), cov (C,2,2), valid (C,)).

    Labels are TILE-LOCAL (< tile*tile) by construction, so the per-cluster
    moment sums are batched factored-indicator matmuls over the tile batch
    (ops/binsum.py) — no global component extraction, no scatter, no big
    sorts (the round-1 extract_components path cost ~9.6 ms at HD; this is
    MXU work on (B, tile^2, 16) indicators).  Moments accumulate in
    tile-LOCAL coordinates (values < tile^2 — exact in f32; global x^2
    sums lose the covariance to cancellation) and means shift back by the
    tile offset, under which the covariance is invariant.  Cluster
    selection reuses the FAST sort-free cutoff top-k on the (B, tile^2)
    count grid."""
    from .fast import _cutoff_select, _pack_key  # sort-free exact top-k
    h, w = binary.shape
    ty, tx = h // tile, w // tile
    b = ty * tx
    tt = tile * tile
    tiles = binary[: ty * tile, : tx * tile] \
        .reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3) \
        .reshape(b, tile, tile)
    local = _batched_label(tiles, max_iters=tt // 2)       # (B, t, t)
    lab = local.reshape(b, tt)          # bins [0, tt); bg tt -> dropped
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

    # top-K clusters by pixel count (counts clamp to 255 for the cutoff
    # search; exact counts are re-read at the K selected slots)
    assert b * tt < (1 << 22), (
        "cluster grid exceeds the 22-bit packed-key index space "
        f"({b}x{tt}); raise `tile` for >4K inputs")
    cnt_u8 = jnp.clip(cnt, 0, 255).astype(jnp.uint8)
    keys = _cutoff_select(cnt_u8, max_clusters)
    sel = (keys & ((1 << 22) - 1)).astype(jnp.int32)
    picked = keys != _pack_key(jnp.int32(0), jnp.int32((1 << 22) - 1))
    bi = jnp.minimum(sel // tt, b - 1)
    li = sel % tt
    top_cnt = jnp.where(picked, cnt[bi, li], 0.0)
    c = jnp.maximum(top_cnt, 1.0)
    offx = (bi % tx).astype(jnp.float32) * tile
    offy = (bi // tx).astype(jnp.float32) * tile
    mx_l = sx[bi, li] / c
    my_l = sy[bi, li] / c
    cxx = sxx[bi, li] / c - mx_l * mx_l
    cyy = syy[bi, li] / c - my_l * my_l
    cxy = sxy[bi, li] / c - mx_l * my_l
    cov = jnp.stack([jnp.stack([cxx, cxy], -1),
                     jnp.stack([cxy, cyy], -1)], -2)
    mean = jnp.stack([mx_l + offx, my_l + offy], -1)
    return top_cnt, mean, cov, top_cnt >= 4.0  # clusters need >=4 px


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
