"""Pose-graph optimization (Gauss-Newton over SE(3) relative constraints).

Beyond-reference subsystem: nodes are keyframe poses, edges are relative
pose measurements (odometry + loop closures) with scalar information
weights. Residual per edge: log(Z_ij^-1 · (X_i^-1 · X_j)) — the standard
pose-graph error — linearized by autodiff and solved densely (N keyframes
per window is small; the distributed layer shards windows, not this solve).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .camera import se3_compose, se3_inverse, se3_relative


class PoseGraph(NamedTuple):
    poses: jax.Array       # (N, 6)
    edge_i: jax.Array      # (E,) int32
    edge_j: jax.Array      # (E,) int32
    edge_z: jax.Array      # (E, 6) measured relative pose i->j
    edge_w: jax.Array      # (E,) information weight
    edge_valid: jax.Array  # (E,) bool
    fixed: jax.Array       # (N,) bool (gauge)


def edge_residual(xi: jax.Array, xj: jax.Array, zij: jax.Array) -> jax.Array:
    """(6,) residual log(Z^-1 X_i^-1 X_j)."""
    rel = se3_relative(xi, xj)
    err = se3_compose(se3_inverse(zij), rel)
    return err  # already (omega | t) minimal coordinates via compose's log


def graph_residuals(poses: jax.Array, g: PoseGraph) -> jax.Array:
    """(E, 6) weighted residual stack."""
    def one(i, j, z, w, v):
        r = edge_residual(poses[i], poses[j], z)
        return r * w * v

    return jax.vmap(one)(g.edge_i, g.edge_j, g.edge_z,
                         g.edge_w.astype(jnp.float32),
                         g.edge_valid.astype(jnp.float32))


def graph_cost(poses: jax.Array, g: PoseGraph) -> jax.Array:
    r = graph_residuals(poses, g)
    return 0.5 * jnp.sum(r * r)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(g: PoseGraph, iters: int = 20, lam: float = 1e-4
             ) -> Tuple[jax.Array, jax.Array]:
    """Damped Gauss-Newton. Returns (poses, final_cost)."""
    n = g.poses.shape[0]

    def res_flat(poses_flat):
        return graph_residuals(poses_flat.reshape(n, 6), g).reshape(-1)

    fixed = jnp.repeat(g.fixed, 6)

    def step(_, poses):
        flat = poses.reshape(-1)
        J = jax.jacfwd(res_flat)(flat)            # (6E, 6N)
        r = res_flat(flat)
        H = J.T @ J + lam * jnp.eye(flat.shape[0], dtype=flat.dtype)
        b = J.T @ r
        mask = (~fixed).astype(H.dtype)
        H = H * mask[:, None] * mask[None, :] + jnp.diag(fixed.astype(H.dtype))
        b = b * mask
        delta = -jnp.linalg.solve(H, b)
        new = flat + delta
        better = graph_cost(new.reshape(n, 6), g) < graph_cost(poses, g)
        return jnp.where(better, new, flat).reshape(n, 6)

    poses = jax.lax.fori_loop(0, iters, step, g.poses)
    return poses, graph_cost(poses, g)
