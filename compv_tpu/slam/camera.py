"""Camera model and SE(3)/SO(3) utilities for the SLAM layer.

Beyond-reference subsystem (SURVEY §7 step 5): the reference stops at
per-plane extrinsics inside calibration (core/calib/compv_core_calib_camera.
cxx:589-643) and has no pose/map machinery. Everything here is jit-friendly:
fixed-size pose parameterization (axis-angle ‖ translation, 6-dof), batched
Rodrigues, pinhole projection with optional radial distortion (the reference
calibrates k1, k2 radial terms, calib_camera.cxx:657+).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    # Python-float defaults, NOT jnp scalars: NamedTuple defaults evaluate at
    # import time, and device arrays captured into jit closures degrade all
    # later dispatches on the axon runtime (see CLAUDE.md gotcha #1)
    k1: jax.Array = 0.0
    k2: jax.Array = 0.0

    @classmethod
    def make(cls, fx, fy, cx, cy, k1=0.0, k2=0.0):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return cls(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2))

    def matrix(self) -> jax.Array:
        return jnp.array([[self.fx, 0.0, self.cx],
                          [0.0, self.fy, self.cy],
                          [0.0, 0.0, 1.0]], jnp.float32)


# ------------------------------------------------------------------- SO(3)

def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (3,) -> rotation matrix (3,3), Rodrigues with small-angle
    Taylor guard. Batched via vmap."""
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-24)
    k = w / theta
    kx = jnp.array([[0.0, -k[2], k[1]],
                    [k[2], 0.0, -k[0]],
                    [-k[1], k[0], 0.0]], w.dtype)
    s = jnp.sin(theta)
    c = jnp.cos(theta)
    r = jnp.eye(3, dtype=w.dtype) + s * kx + (1.0 - c) * (kx @ kx)
    # small-angle: R ~ I + [w]x
    wx = jnp.array([[0.0, -w[2], w[1]],
                    [w[2], 0.0, -w[0]],
                    [-w[1], w[0], 0.0]], w.dtype)
    r_small = jnp.eye(3, dtype=w.dtype) + wx
    return jnp.where(theta2 < 1e-12, r_small, r)


def so3_log(r: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle (3,)."""
    cos_theta = jnp.clip((jnp.trace(r) - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    v = jnp.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]],
                  r.dtype)
    sin_theta = jnp.sin(theta)
    scale = jnp.where(jnp.abs(sin_theta) < 1e-7, 0.5,
                      theta / (2.0 * jnp.where(jnp.abs(sin_theta) < 1e-7,
                                               1.0, sin_theta)))
    return v * scale


# ------------------------------------------------------------------- SE(3)

class SE3(NamedTuple):
    """Pose as (6,) or (..., 6): [omega (3), t (3)]. world->camera by default
    for camera poses: x_cam = R x_world + t."""
    wt: jax.Array

    @property
    def omega(self):
        return self.wt[..., :3]

    @property
    def t(self):
        return self.wt[..., 3:]

    @classmethod
    def identity(cls, batch=()):
        return cls(jnp.zeros(batch + (6,), jnp.float32))


def se3_apply(wt: jax.Array, x: jax.Array) -> jax.Array:
    """Transform (3,) point by (6,) pose."""
    r = so3_exp(wt[:3])
    return r @ x + wt[3:]


def se3_inverse(wt: jax.Array) -> jax.Array:
    r = so3_exp(wt[:3])
    return jnp.concatenate([-wt[:3], -(r.T @ wt[3:])])


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """a ∘ b: apply b then a."""
    ra = so3_exp(a[:3])
    rb = so3_exp(b[:3])
    r = ra @ rb
    t = ra @ b[3:] + a[3:]
    return jnp.concatenate([so3_log(r), t])


def se3_relative(a: jax.Array, b: jax.Array) -> jax.Array:
    """a^-1 ∘ b (relative pose from a to b)."""
    return se3_compose(se3_inverse(a), b)


# --------------------------------------------------------------- projection

def project(wt: jax.Array, intr: Intrinsics, x_world: jax.Array) -> jax.Array:
    """Project one world point (3,) by pose (6,) -> pixel (2,). Points behind
    the camera project to large coordinates (guarded divide); callers mask by
    depth via `point_depth`."""
    xc = se3_apply(wt, x_world)
    z = jnp.where(jnp.abs(xc[2]) < 1e-6, 1e-6, xc[2])
    xn = xc[0] / z
    yn = xc[1] / z
    r2 = xn * xn + yn * yn
    distort = 1.0 + intr.k1 * r2 + intr.k2 * r2 * r2
    u = intr.fx * xn * distort + intr.cx
    v = intr.fy * yn * distort + intr.cy
    return jnp.stack([u, v])


def point_depth(wt: jax.Array, x_world: jax.Array) -> jax.Array:
    return se3_apply(wt, x_world)[2]


project_batch = jax.vmap(project, in_axes=(None, None, 0))


def triangulate_linear(wt1: jax.Array, wt2: jax.Array, intr: Intrinsics,
                       uv1: jax.Array, uv2: jax.Array) -> jax.Array:
    """Linear (DLT) two-view triangulation of one correspondence -> (3,)
    world point. Solves the 4x4 homogeneous system via the smallest
    eigenvector of AᵗA (same machinery as the homography DLT)."""
    from ..geometry.linalg import eigh_jacobi

    def proj_matrix(wt):
        r = so3_exp(wt[:3])
        rt = jnp.concatenate([r, wt[3:, None]], axis=1)  # (3, 4)
        return intr.matrix() @ rt

    p1 = proj_matrix(wt1)
    p2 = proj_matrix(wt2)
    rows = jnp.stack([
        uv1[0] * p1[2] - p1[0],
        uv1[1] * p1[2] - p1[1],
        uv2[0] * p2[2] - p2[0],
        uv2[1] * p2[2] - p2[1],
    ])
    _, v = eigh_jacobi(rows.T @ rows, sweeps=12)
    xh = v[:, 0]
    w = jnp.where(jnp.abs(xh[3]) < 1e-12, 1e-12, xh[3])
    return xh[:3] / w


triangulate_batch = jax.vmap(triangulate_linear,
                             in_axes=(None, None, None, 0, 0))
