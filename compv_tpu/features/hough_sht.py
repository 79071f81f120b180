"""Standard Hough transform (SHT) for lines.

Re-design of core/features/hough/compv_core_feature_houghsht.cxx:58-668 (+
SSE/AVX/NEON accumulator asm): edge-list build -> polar accumulator
(rho = x cosθ + y sinθ) -> accumulator NMS -> threshold & sort -> cartesian.

TPU formulation: edge pixels are extracted into a fixed-capacity coordinate
list (top_k over the edge map — same budgeting trick as FAST points); voting
is a batched factored-indicator matmul (ops/binsum.py) building per-theta
rho histograms on the int8 MXU — K·T indicator compares + one contraction
instead of H·W·T scatter-adds; NMS + top-k mirror the FAST postlude.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HoughConfig
from ..core.registry import register
from ..ops import binsum, compaction


def select_peaks(acc_nms: jax.Array, max_lines: int, cap: int = 4096):
    """Top `max_lines` (value, flat_idx) of a sparse post-NMS accumulator.

    lax.top_k over the full (n_rho * n_theta) grid is a full sort (trap:
    ~ms at 0.5M cells); NMS+threshold leave FEW peaks (~100 at HD), so
    compact the nonzeros and top_k the capacity buffer. Compaction is a
    0/1-key cutoff selection (features/fast.cutoff_topk_flat — one
    histogram + one Pallas select pass; the prior ops/compaction.py
    butterfly re-read the full grid per stage, 0.88 ms of the round-4
    hough rows) and works for ANY accumulator dtype because values ride
    a gather, not the key. If more than `cap` cells survive (degenerate
    threshold on a busy edge map), a lax.cond falls back to the exact
    full-grid top_k so a strong late-scan peak is never dropped — the
    slow path costs only compile time when untaken."""
    n_rho, n_theta = acc_nms.shape
    cap = min(cap, acc_nms.size)
    k = min(max_lines, cap)
    flat = acc_nms.reshape(-1)

    if acc_nms.size < (1 << 22):    # packed-index space of the cutoff
        from .fast import cutoff_topk_flat
        nz = flat != 0
        picked, pos = cutoff_topk_flat(nz.astype(jnp.uint8), cap)
        total = jnp.sum(nz.astype(jnp.int32))
        v = jnp.where(picked, flat[pos], 0)

        def compacted(_):
            vals, j = jax.lax.top_k(v.astype(jnp.float32), k)
            return vals, pos[j]
    else:
        flat_idx = (jax.lax.broadcasted_iota(jnp.int32, acc_nms.shape, 0)
                    * n_theta
                    + jax.lax.broadcasted_iota(jnp.int32, acc_nms.shape, 1))
        (v0, i0), ok, total = compaction.compact(
            acc_nms > 0, (acc_nms, flat_idx), cap)
        v = jnp.where(ok, v0, 0)
        i0 = jnp.where(ok, i0, 0)

        def compacted(_):
            vals, j = jax.lax.top_k(v.astype(jnp.float32), k)
            return vals, i0[j]

    def full_grid(_):
        vals, idx = jax.lax.top_k(flat.astype(jnp.float32), k)
        return vals, idx.astype(jnp.int32)

    vals, idx = jax.lax.cond(total <= cap, compacted, full_grid, None)
    if k < max_lines:
        vals = jnp.pad(vals, (0, max_lines - k))
        idx = jnp.pad(idx, (0, max_lines - k))
    return vals, idx


class HoughLines(NamedTuple):
    """Fixed-capacity polar line set (reference CompVHoughLine
    {rho, theta, strength}, compv_common.h:641-650)."""

    rho: jax.Array       # (M,) float32
    theta: jax.Array     # (M,) float32 radians
    strength: jax.Array  # (M,) int32 votes
    count: jax.Array     # () int32


def edge_coordinates(edges: jax.Array, max_points: int):
    """(K, 2) xy of the first `max_points` edge pixels in scan order +
    valid mask (reference edge-list build,
    compv_core_feature_houghsht.cxx:58-120).

    A 0/1 key selection via the FAST sort-free cutoff machinery
    (features/fast.cutoff_topk_flat): equal keys resolve by ascending
    flat index == scan order, and on the Pallas path the whole map runs
    through one histogram + one select/compact kernel pass — the prior
    XLA butterfly (ops/compaction.py) re-read the full map per stage,
    ~20 HBM passes at HD (the bulk of the round-4 hough_sht row).
    Images >= 2^22 px fall back to the butterfly (packed-index space)."""
    h, w = edges.shape
    if h * w < (1 << 22):
        from .fast import cutoff_topk_flat
        picked, idx = cutoff_topk_flat(
            (edges > 0).astype(jnp.uint8).reshape(-1), max_points)
        xs = jnp.where(picked, idx % w, 0)
        ys = jnp.where(picked, idx // w, 0)
        return jnp.stack([xs.astype(jnp.float32),
                          ys.astype(jnp.float32)], 1), picked
    xs_g = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    ys_g = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    (xs, ys), valid, _ = compaction.compact(
        edges > 0, (xs_g, ys_g), min(max_points, h * w))
    k = min(max_points, h * w)
    xs = jnp.where(valid, xs, 0)
    ys = jnp.where(valid, ys, 0)
    if k < max_points:
        pad = max_points - k
        xs = jnp.pad(xs, (0, pad))
        ys = jnp.pad(ys, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    return jnp.stack([xs.astype(jnp.float32),
                      ys.astype(jnp.float32)], 1), valid


@functools.partial(jax.jit, static_argnames=("config", "max_edge_points",
                                             "height", "width"))
def hough_lines_sht(edges: jax.Array, config: HoughConfig = HoughConfig(),
                    max_edge_points: int = 16384,
                    height: int = None, width: int = None) -> HoughLines:
    """Detect lines in a binary edge map (uint8 {0,255} or bool)."""
    h, w = edges.shape
    diag = float(np.hypot(h, w))
    n_rho = int(2 * np.ceil(diag / config.rho)) + 1
    n_theta = config.theta_steps
    thetas = jnp.asarray(
        np.arange(n_theta, dtype=np.float32) * (np.pi / n_theta))
    cos_t = jnp.cos(thetas)
    sin_t = jnp.sin(thetas)

    xy, valid = edge_coordinates(edges, max_edge_points)
    from ..kernels.dispatch import pallas_enabled
    if pallas_enabled() and n_rho <= 4096:
        # one-hot factors built in VMEM and fed straight to the MXU
        # (kernels/hough_vote.py) — the XLA binsum below materializes
        # (T, N, BHI+BLO) int8 indicators through HBM (~633 MB at HD)
        from ..kernels.hough_vote import sht_vote_pallas
        acc = sht_vote_pallas(xy, valid, cos_t, sin_t, n_rho,
                              float(config.rho)).astype(jnp.int32)
    else:
        # rho index per (point, theta): offset to keep indices positive
        rho = xy[:, 0:1] * cos_t[None, :] + xy[:, 1:2] * sin_t[None, :]
        rho_idx = jnp.round(rho / config.rho).astype(jnp.int32) \
            + (n_rho // 2)
        rho_idx = jnp.clip(rho_idx, 0, n_rho - 1)
        # invalid points vote nowhere: binsum drops out-of-range indices
        rho_idx = jnp.where(valid[:, None], rho_idx, n_rho)
        # per-theta rho histograms as ONE batched factored-indicator
        # matmul (ops/binsum.py) — round 1's K*T scatter votes serialized
        # on the TPU scatter unit (~22 ms at HD)
        acc = binsum.bincount_batched(rho_idx.T, n_rho).T

    # accumulator NMS (3x3, ties keep — reference nms :481)
    pad = jnp.pad(acc, 1)
    neigh = [jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (n_rho, n_theta))
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    nmax = functools.reduce(jnp.maximum, neigh)
    acc_nms = jnp.where(acc >= nmax, acc, 0)
    acc_nms = jnp.where(acc_nms >= config.threshold, acc_nms, 0)

    vals, idx = select_peaks(acc_nms, config.max_lines)
    line_valid = vals > 0
    r_i = idx // n_theta
    t_i = idx % n_theta
    return HoughLines(
        rho=(r_i - n_rho // 2).astype(jnp.float32) * config.rho,
        theta=t_i.astype(jnp.float32) * (np.pi / n_theta),
        strength=vals.astype(jnp.int32),
        count=jnp.sum(line_valid).astype(jnp.int32),
    )


def lines_to_cartesian(lines: HoughLines, width: int, height: int):
    """Polar -> two endpoint cartesian segments spanning the image (reference
    toCartesian): returns (M, 4) [x0, y0, x1, y1]."""
    c = jnp.cos(lines.theta)
    s = jnp.sin(lines.theta)
    x0 = c * lines.rho
    y0 = s * lines.rho
    span = float(np.hypot(width, height))
    return jnp.stack([x0 - span * s, y0 + span * c,
                      x0 + span * s, y0 - span * c], axis=1)


@register("hough", "sht")
def make_hough_sht(config: HoughConfig = HoughConfig()):
    """Factory (reference COMPV_HOUGHSHT_ID)."""

    def run(edges: jax.Array) -> HoughLines:
        return hough_lines_sht(edges, config)

    return run
