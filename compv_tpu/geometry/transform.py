"""Point transforms: perspective2D, homogeneous->cartesian.

Reference: base/include/compv/base/math/compv_math_transform.h:19-20.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def to_homogeneous(pts: jax.Array) -> jax.Array:
    """(N, 2) -> (N, 3) with w = 1."""
    return jnp.concatenate([pts, jnp.ones((pts.shape[0], 1), pts.dtype)], axis=1)


def homogeneous_to_cartesian2d(pts3: jax.Array) -> jax.Array:
    """(N, 3) -> (N, 2), dividing by w (guarded)."""
    w = pts3[:, 2]
    inv = 1.0 / jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return pts3[:, :2] * inv[:, None]


def perspective2d(pts: jax.Array, h3x3: jax.Array) -> jax.Array:
    """Apply homography H to (N, 2) points -> (N, 2)."""
    p = to_homogeneous(pts.astype(jnp.float32)) @ h3x3.T
    return homogeneous_to_cartesian2d(p)
