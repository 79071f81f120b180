"""Kernel-based Hough transform (KHT) for lines.

Re-design of core/features/hough/compv_core_feature_houghkht.cxx:207-1309
(Fernandes & Oliveira 2008): the reference chains edge pixels into strings
(linking_AppendixA), subdivides them into clusters, fits a line per cluster,
and votes an elliptical-Gaussian kernel per cluster into the (rho, theta)
accumulator, thresholding with a global scale GS.

TPU formulation — same three phases, each parallel:
  1. linking/clustering -> connected-component labeling of the edge map
     (features/ccl.py) + per-component scatter statistics via segment_sum;
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
from . import ccl
from .hough_sht import HoughLines


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


def _tiled_labels(binary: jax.Array, tile: int) -> jax.Array:
    """Connected-component labels computed independently per (tile x tile)
    block — the TPU-native version of KHT's subdivision of linked strings
    into approximately-straight clusters (houghkht.cxx clusters_find): a
    curve or crossing is cut at tile boundaries into short, mostly-straight
    pieces, while a straight segment splits into collinear pieces that vote
    to the same accumulator cell anyway. Returns global-unique labels with
    background = H*W."""
    h, w = binary.shape
    ty, tx = h // tile, w // tile
    n = h * w
    tiles = binary[: ty * tile, : tx * tile] \
        .reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, tile, tile)
    # worst-case internal path of a winding string inside one tile is
    # ~tile*tile/2 steps with one-step propagation; the while_loop exits
    # early on convergence so the cap is only a safety bound (a too-small
    # cap would split one string into several, duplicating KHT votes)
    local = _batched_label(tiles, max_iters=(tile * tile) // 2)
    # globalize: local labels < tile*tile; background tile*tile
    tile_ids = jnp.arange(ty * tx, dtype=jnp.int32)[:, None, None]
    glob = jnp.where(local < tile * tile,
                     tile_ids * (tile * tile) + local, n)
    out = jnp.full((h, w), n, jnp.int32)
    glob = glob.reshape(ty, tx, tile, tile).transpose(0, 2, 1, 3) \
        .reshape(ty * tile, tx * tile)
    return out.at[: ty * tile, : tx * tile].set(glob)


def cluster_statistics(binary: jax.Array, max_clusters: int = 512,
                       tile: int = 16):
    """Tile-subdivided clusters + per-cluster first/second moments.

    Returns (count (C,), mean (C,2), cov (C,2,2), valid (C,)).
    """
    labels = _tiled_labels(binary, tile)
    # per-cluster moments via the run-based component extractor — six
    # scatter-based segment_sums over megapixel segment spaces cost ~45 ms
    # at HD on v5e (scatter ~6 ns/element); extract_components computes the
    # identical six moments from closed-form per-run sums in ~2 ms
    comps = ccl.extract_components(labels, max_components=max_clusters)
    m = comps.moments
    top_cnt = m[:, 0]
    c = jnp.maximum(top_cnt, 1.0)
    mx = m[:, 1] / c
    my = m[:, 2] / c
    cxx = m[:, 3] / c - mx * mx
    cyy = m[:, 5] / c - my * my
    cxy = m[:, 4] / c - mx * my
    cov = jnp.stack([jnp.stack([cxx, cxy], -1),
                     jnp.stack([cxy, cyy], -1)], -2)
    mean = jnp.stack([mx, my], -1)
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

    flat = acc_nms.reshape(-1)
    k = min(config.max_lines, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, k)
    if k < config.max_lines:
        vals = jnp.pad(vals, (0, config.max_lines - k))
        idx = jnp.pad(idx, (0, config.max_lines - k))
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
