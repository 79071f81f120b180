"""Windowed bundle adjustment: Levenberg-Marquardt with Schur-complement
reduction of the camera-point system.

Beyond-reference subsystem (SURVEY §3.4 note: the reference's only
"BA-like" optimizer is the lmfit Levenberg-Marquardt refine inside camera
calibration, calib_camera.cxx:1030-1170; full BA is absent).

TPU-native design:
  * Fixed-capacity observation table: (O,) rows of
    (pose_idx, point_idx, uv, valid) — static shapes under jit.
  * Per-observation 2x6 / 2x3 Jacobian blocks from autodiff (vmapped
    jacfwd of the projection), Huber-weighted.
  * Hessian blocks accumulated with segment_sum over pose/point indices —
    the TPU-friendly scatter-free reduction.
  * Landmarks eliminated by the Schur complement: per-landmark 3x3 inverse
    (closed form, vmapped), reduced camera system S (6P x 6P dense — window
    BA keeps P small) solved with jnp.linalg.solve, then landmark
    back-substitution.
  * LM damping with accept/reject under lax.while_loop.

Distribution (parallel/dist_ba.py): observations are sharded across devices;
U, W-stacked, V, and the gradient are psum'd — S and the solve are tiny and
replicated. This file is mesh-agnostic; `reduce_fn` abstracts the psum.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import BAConfig
from .camera import Intrinsics, project


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem.

    poses:     (P, 6) camera poses (world->cam axis-angle | t)
    points:    (L, 3) landmarks
    obs_pose:  (O,) int32 pose index per observation
    obs_point: (O,) int32 landmark index per observation
    obs_uv:    (O, 2) measured pixels
    obs_valid: (O,) bool
    fixed_poses: (P,) bool — gauge freeze (at least pose 0 in mono)
    """

    poses: jax.Array
    points: jax.Array
    obs_pose: jax.Array
    obs_point: jax.Array
    obs_uv: jax.Array
    obs_valid: jax.Array
    fixed_poses: jax.Array


class BAStats(NamedTuple):
    initial_cost: jax.Array
    final_cost: jax.Array
    iterations: jax.Array


def _residuals(poses, points, intr, prob: BAProblem) -> jax.Array:
    """(O, 2) reprojection residuals (invalid rows zeroed)."""
    def one(pi, li, uv):
        return project(poses[pi], intr, points[li]) - uv

    r = jax.vmap(one)(prob.obs_pose, prob.obs_point, prob.obs_uv)
    return jnp.where(prob.obs_valid[:, None], r, 0.0)


def _huber_weights(r: jax.Array, delta: float) -> jax.Array:
    """(O,) IRLS weights for the Huber loss."""
    norm = jnp.sqrt(jnp.sum(r * r, axis=1) + 1e-12)
    return jnp.where(norm <= delta, 1.0, delta / norm)


def cost(poses, points, intr, prob: BAProblem, delta: float) -> jax.Array:
    r = _residuals(poses, points, intr, prob)
    n = jnp.sqrt(jnp.sum(r * r, axis=1) + 1e-12)
    rho = jnp.where(n <= delta, 0.5 * n * n, delta * (n - 0.5 * delta))
    return jnp.sum(jnp.where(prob.obs_valid, rho, 0.0))


def _jacobian_blocks(poses, points, intr, prob: BAProblem):
    """Per-observation A (2,6) pose-Jacobian and B (2,3) point-Jacobian."""
    def one(pi, li, uv):
        fa = lambda wt: project(wt, intr, points[li]) - uv
        fb = lambda x: project(poses[pi], intr, x) - uv
        return jax.jacfwd(fa)(poses[pi]), jax.jacfwd(fb)(points[li])

    return jax.vmap(one)(prob.obs_pose, prob.obs_point, prob.obs_uv)


def build_normal_equations(poses, points, intr, prob: BAProblem,
                           delta: float,
                           reduce_fn: Callable = lambda x: x):
    """Accumulate the BA normal-equation blocks.

    Returns (U (P,6,6), V (L,3,3), W (L,P,6,3), g_c (P,6), g_p (L,3)).
    ``reduce_fn`` sums partial blocks across devices (psum) when observations
    are sharded — identity on one device.
    """
    P = poses.shape[0]
    L = points.shape[0]
    r = _residuals(poses, points, intr, prob)
    w = _huber_weights(r, delta) * prob.obs_valid.astype(jnp.float32)
    A, B = _jacobian_blocks(poses, points, intr, prob)   # (O,2,6), (O,2,3)
    Aw = A * w[:, None, None]
    Bw = B * w[:, None, None]

    ata = jnp.einsum("oij,oik->ojk", Aw, A)              # (O,6,6)
    btb = jnp.einsum("oij,oik->ojk", Bw, B)              # (O,3,3)
    atb = jnp.einsum("oij,oik->ojk", Aw, B)              # (O,6,3)
    atr = jnp.einsum("oij,oi->oj", Aw, r)                # (O,6)
    btr = jnp.einsum("oij,oi->oj", Bw, r)                # (O,3)

    U = reduce_fn(jax.ops.segment_sum(ata, prob.obs_pose, num_segments=P))
    V = reduce_fn(jax.ops.segment_sum(btb, prob.obs_point, num_segments=L))
    g_c = reduce_fn(jax.ops.segment_sum(atr, prob.obs_pose, num_segments=P))
    g_p = reduce_fn(jax.ops.segment_sum(btr, prob.obs_point, num_segments=L))
    # W stacked dense over (L, P): window BA keeps P small so (L,P,6,3) is
    # compact; index (l * P + p) makes one segment_sum suffice.
    W = reduce_fn(jax.ops.segment_sum(
        atb, prob.obs_point * P + prob.obs_pose, num_segments=L * P
    ).reshape(L, P, 6, 3))
    return U, V, W, g_c, g_p


def _inv3x3_batch(v: jax.Array) -> jax.Array:
    """Closed-form batched 3x3 inverse (landmark Hessian blocks)."""
    a = v
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
    c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    cof = jnp.stack([
        jnp.stack([c00,
                   a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2],
                   a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]], -1),
        jnp.stack([c01,
                   a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0],
                   a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]], -1),
        jnp.stack([c02,
                   a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1],
                   a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]], -1),
    ], -2)
    return cof / det[:, None, None]


def schur_solve(U, V, W, g_c, g_p, lam, fixed_poses):
    """Solve the damped system by eliminating landmarks.

    Returns (delta_poses (P,6), delta_points (L,3)).
    """
    P = U.shape[0]
    L = V.shape[0]
    eye3 = jnp.eye(3, dtype=V.dtype)
    Vd = V + lam * eye3[None]
    # extra absolute floor keeps unobserved landmarks inert
    Vinv = _inv3x3_batch(Vd + 1e-6 * eye3[None])
    Y = jnp.einsum("lpij,ljk->lpik", W, Vinv)            # (L,P,6,3)
    # S = blockdiag(U + lam I) - sum_l Y_l W_lᵀ
    S_cross = jnp.einsum("lpik,lqjk->piqj", Y, W).reshape(P * 6, P * 6)
    U_damped = U + lam * jnp.eye(6, dtype=U.dtype)[None]
    S = _blockdiag(U_damped) - S_cross
    rhs = (g_c.reshape(P * 6)
           - jnp.einsum("lpik,lk->pi", Y, g_p).reshape(P * 6))
    # gauge: zero rows/cols of fixed poses, identity on their diagonal
    fixed = jnp.repeat(fixed_poses, 6)
    mask = (~fixed).astype(S.dtype)
    S = S * mask[:, None] * mask[None, :] + jnp.diag(fixed.astype(S.dtype))
    rhs = rhs * mask
    delta_c = -jnp.linalg.solve(S, rhs).reshape(P, 6)
    # back-substitute landmarks: delta_p = -Vinv (g_p + sum_p W_lpᵀ delta_c_p)
    wtd = jnp.einsum("lpij,pi->lj", W, delta_c)          # (L,3)
    delta_p = -jnp.einsum("lij,lj->li", Vinv, g_p + wtd)
    return delta_c, delta_p


def _blockdiag(blocks: jax.Array) -> jax.Array:
    """(P, k, k) -> (P*k, P*k) block diagonal without python unrolling."""
    P, k, _ = blocks.shape
    out = jnp.zeros((P, k, P, k), blocks.dtype)
    idx = jnp.arange(P)
    out = out.at[idx, :, idx, :].set(blocks)
    return out.reshape(P * k, P * k)


class _LMState(NamedTuple):
    poses: jax.Array
    points: jax.Array
    lam: jax.Array
    cost: jax.Array
    it: jax.Array


@functools.partial(jax.jit, static_argnames=("config",))
def bundle_adjust(prob: BAProblem, intr: Intrinsics,
                  config: BAConfig = BAConfig()
                  ) -> Tuple[jax.Array, jax.Array, BAStats]:
    """Run LM bundle adjustment; returns (poses, points, stats)."""
    delta = config.huber_delta
    c0 = cost(prob.poses, prob.points, intr, prob, delta)

    def step(state: _LMState) -> _LMState:
        U, V, W, g_c, g_p = build_normal_equations(
            state.poses, state.points, intr, prob, delta)
        dc, dp = schur_solve(U, V, W, g_c, g_p, state.lam, prob.fixed_poses)
        new_poses = state.poses + dc
        new_points = state.points + dp
        new_cost = cost(new_poses, new_points, intr, prob, delta)
        accept = new_cost < state.cost
        return _LMState(
            poses=jnp.where(accept, new_poses, state.poses),
            points=jnp.where(accept, new_points, state.points),
            lam=jnp.where(accept, state.lam * config.damping_down,
                          state.lam * config.damping_up),
            cost=jnp.where(accept, new_cost, state.cost),
            it=state.it + 1,
        )

    def cond(state: _LMState):
        return (state.it < config.max_iters) & (state.lam < 1e6)

    init = _LMState(prob.poses, prob.points,
                    jnp.asarray(config.damping_init, jnp.float32), c0,
                    jnp.asarray(0, jnp.int32))
    final = jax.lax.while_loop(cond, step, init)
    return final.poses, final.points, BAStats(c0, final.cost, final.it)
