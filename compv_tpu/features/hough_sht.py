"""Standard Hough transform (SHT) for lines.

Re-design of core/features/hough/compv_core_feature_houghsht.cxx:58-668 (+
SSE/AVX/NEON accumulator asm): edge-list build -> polar accumulator
(rho = x cosθ + y sinθ) -> accumulator NMS -> threshold & sort -> cartesian.

TPU formulation: edge pixels are extracted into a fixed-capacity coordinate
list (top_k over the edge map — same budgeting trick as FAST points); voting
is a segment_sum of K points x T thetas into the (rho, theta) accumulator —
K·T adds instead of H·W·T; NMS + top-k mirror the FAST postlude.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import HoughConfig
from ..core.registry import register


class HoughLines(NamedTuple):
    """Fixed-capacity polar line set (reference CompVHoughLine
    {rho, theta, strength}, compv_common.h:641-650)."""

    rho: jax.Array       # (M,) float32
    theta: jax.Array     # (M,) float32 radians
    strength: jax.Array  # (M,) int32 votes
    count: jax.Array     # () int32


def edge_coordinates(edges: jax.Array, max_points: int):
    """(K, 2) xy of the strongest edge pixels + valid mask. For binary maps
    all on-pixels are equal-strength; top_k picks deterministically."""
    h, w = edges.shape
    flat = edges.reshape(-1).astype(jnp.float32)
    k = min(max_points, h * w)
    vals, idx = jax.lax.top_k(flat, k)
    valid = vals > 0
    xs = (idx % w).astype(jnp.float32)
    ys = (idx // w).astype(jnp.float32)
    return jnp.stack([xs, ys], 1), valid


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
    # rho index per (point, theta): offset to keep indices positive
    rho = xy[:, 0:1] * cos_t[None, :] + xy[:, 1:2] * sin_t[None, :]
    rho_idx = jnp.round(rho / config.rho).astype(jnp.int32) + (n_rho // 2)
    rho_idx = jnp.clip(rho_idx, 0, n_rho - 1)
    # flatten (point, theta) votes into the (n_rho * n_theta) accumulator
    theta_idx = jnp.broadcast_to(
        jnp.arange(n_theta, dtype=jnp.int32)[None, :], rho_idx.shape)
    seg = rho_idx * n_theta + theta_idx
    votes = jnp.broadcast_to(valid[:, None].astype(jnp.int32), rho_idx.shape)
    acc = jax.ops.segment_sum(votes.reshape(-1), seg.reshape(-1),
                              num_segments=n_rho * n_theta)
    acc = acc.reshape(n_rho, n_theta)

    # accumulator NMS (3x3, ties keep — reference nms :481)
    pad = jnp.pad(acc, 1)
    neigh = [jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (n_rho, n_theta))
             for dy in (-1, 0, 1) for dx in (-1, 0, 1) if (dy, dx) != (0, 0)]
    nmax = functools.reduce(jnp.maximum, neigh)
    acc_nms = jnp.where(acc >= nmax, acc, 0)
    acc_nms = jnp.where(acc_nms >= config.threshold, acc_nms, 0)

    flat = acc_nms.reshape(-1)
    k = min(config.max_lines, flat.shape[0])
    vals, idx = jax.lax.top_k(flat, k)
    if k < config.max_lines:
        vals = jnp.pad(vals, (0, config.max_lines - k))
        idx = jnp.pad(idx, (0, config.max_lines - k))
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
