"""Dense linear algebra for geometry: batched symmetric Jacobi eigensolver,
SVD via eigen of AᵗA, pseudo-inverse, small-matrix helpers.

Re-design of CompVMatrix / CompVMathEigen (base/math/compv_math_matrix.cxx:
870-1058, compv_math_eigen.cxx:29-575 + Givens-rotation asm): the reference
runs one Jacobi eigensolve at a time with threaded max-off-diagonal scans.
On TPU we run a *batch* of B small eigensolves simultaneously (vmapped
cyclic-Jacobi sweeps with fixed iteration count) — thousands of 9x9 solves
per RANSAC call become one fused tensor program.

Cyclic Jacobi (fixed sweep schedule) replaces the reference's greedy
max-off-diag pivoting: data-independent control flow, same quadratic
convergence after ~6-10 sweeps for n<=9.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _jacobi_rotate(a: jax.Array, v: jax.Array, p: int, q: int):
    """One Jacobi rotation zeroing a[p,q], updating eigenvector accumulator v.
    Static indices p < q; works on (n, n) float matrices."""
    app = a[p, p]
    aqq = a[q, q]
    apq = a[p, q]
    # rotation angle: theta = 0.5 * atan2(2 apq, aqq - app)
    theta = 0.5 * jnp.arctan2(2.0 * apq, aqq - app)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    # skip (identity) when apq == 0 to avoid useless mixing
    is_zero = jnp.abs(apq) < 1e-30
    c = jnp.where(is_zero, 1.0, c)
    s = jnp.where(is_zero, 0.0, s)
    rot_p = c * a[p, :] - s * a[q, :]
    rot_q = s * a[p, :] + c * a[q, :]
    a = a.at[p, :].set(rot_p).at[q, :].set(rot_q)
    col_p = c * a[:, p] - s * a[:, q]
    col_q = s * a[:, p] + c * a[:, q]
    a = a.at[:, p].set(col_p).at[:, q].set(col_q)
    vp = c * v[:, p] - s * v[:, q]
    vq = s * v[:, p] + c * v[:, q]
    v = v.at[:, p].set(vp).at[:, q].set(vq)
    return a, v


@functools.partial(jax.jit, static_argnames=("sweeps", "sort"))
def eigh_jacobi(s: jax.Array, sweeps: int = 10, sort: bool = True
                ) -> Tuple[jax.Array, jax.Array]:
    """Eigen-decomposition of a symmetric matrix by cyclic Jacobi sweeps.

    Returns (eigenvalues (n,), eigenvectors (n, n) column-major — column i is
    the eigenvector of eigenvalue i). `sort=True` gives ascending eigenvalues
    (the reference sorts descending, compv_math_eigen.cxx; callers that need
    the min-eigenvector just take column 0 here).

    Batched use: jax.vmap(eigh_jacobi) over a (B, n, n) stack.
    """
    n = s.shape[-1]
    a = s.astype(jnp.float32)
    v = jnp.eye(n, dtype=jnp.float32)

    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def sweep(_, av):
        a, v = av
        for p, q in pairs:           # static unroll: n(n-1)/2 rotations
            a, v = _jacobi_rotate(a, v, p, q)
        return a, v

    a, v = jax.lax.fori_loop(0, sweeps, sweep, (a, v))
    w = jnp.diagonal(a)
    if sort:
        order = jnp.argsort(w)
        w = w[order]
        v = v[:, order]
    return w, v


def eigh_batched(s: jax.Array, sweeps: int = 10):
    """(B, n, n) symmetric stack -> (B, n) eigenvalues asc, (B, n, n) vectors."""
    return jax.vmap(lambda m: eigh_jacobi(m, sweeps=sweeps))(s)


def eigh_converged(s: jax.Array, w: jax.Array, v: jax.Array,
                   tol: float = 1e-4) -> jax.Array:
    """() bool device-side convergence check for an eigh_jacobi result
    (docs/API.md failure convention): the residual max|S v - v diag(w)|
    must be below tol * max|w|.  Cyclic Jacobi with the default sweep
    count converges for every symmetric matrix in practice, but extreme
    conditioning can stall in f32 — callers that feed ill-conditioned
    scatter matrices (DLT on near-degenerate configurations) gate on this
    instead of consuming silent garbage.  Cost: one (n,n)@(n,n) matmul."""
    r = s.astype(jnp.float32) @ v - v * w[None, :]
    return jnp.max(jnp.abs(r)) <= tol * jnp.maximum(jnp.max(jnp.abs(w)),
                                                    1e-30)


def min_eigenvector(s: jax.Array, sweeps: int = 10) -> jax.Array:
    """Eigenvector of the smallest eigenvalue (what DLT needs)."""
    _, v = eigh_jacobi(s, sweeps=sweeps)
    return v[:, 0]


def svd_via_ata(a: jax.Array, sweeps: int = 12):
    """SVD built from Jacobi eigen of AᵗA, the reference's construction
    (compv_math_matrix.cxx:954: svd via eigenS(AᵗA)). Returns (U, S, Vt).
    Suitable for small well-conditioned systems (calibration, homography)."""
    ata = a.T @ a
    w, v = eigh_jacobi(ata, sweeps=sweeps, sort=True)
    # descending singular values
    w = w[::-1]
    v = v[:, ::-1]
    s_vals = jnp.sqrt(jnp.maximum(w, 0.0))
    inv_s = jnp.where(s_vals > 1e-12, 1.0 / jnp.maximum(s_vals, 1e-30), 0.0)
    u = a @ v * inv_s[None, :]
    return u, s_vals, v.T


def svd3x3(a: jax.Array, sweeps: int = 14):
    """Rank-safe SVD of a 3x3 matrix: like svd_via_ata but U columns for
    (near-)zero singular values are completed to an orthonormal basis via
    cross products — required for essential-matrix decomposition where
    s3 = 0 exactly (svd_via_ata would return a zero U column)."""
    u, s, vt = svd_via_ata(a, sweeps=sweeps)
    # f32 Jacobi eigenvalue noise floor is ~1e-7·s1^2; after sqrt a true-zero
    # singular value reads as ~3e-4·s1, so the rank test must sit above that.
    eps = 1e-3 * jnp.maximum(s[0], 1e-30)

    def unit(v):
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30)

    u0 = unit(jnp.where(s[0] > eps, u[:, 0], jnp.asarray([1.0, 0.0, 0.0])))
    # u1: from A if valid, else any vector orthogonal to u0
    alt1 = unit(jnp.cross(u0, jnp.where(
        jnp.abs(u0[0]) < 0.9, jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]))))
    u1 = unit(jnp.where(s[1] > eps, u[:, 1], alt1))
    u2 = unit(jnp.where(s[2] > eps, u[:, 2], jnp.cross(u0, u1)))
    return jnp.stack([u0, u1, u2], axis=1), s, vt


def pseudoinv(a: jax.Array, sweeps: int = 12) -> jax.Array:
    """Moore-Penrose pseudo-inverse via the same SVD route as the reference
    (compv_math_matrix.cxx:961)."""
    u, s, vt = svd_via_ata(a, sweeps=sweeps)
    inv_s = jnp.where(s > 1e-10 * jnp.max(s), 1.0 / jnp.maximum(s, 1e-30), 0.0)
    return vt.T @ (inv_s[:, None] * u.T)


def inv3x3(a: jax.Array) -> jax.Array:
    """Closed-form 3x3 inverse (reference invA3x3 with pseudoinv fallback,
    compv_math_matrix.cxx:968); falls back to pseudoinv when singular."""
    c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
    c01 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
    c02 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
    det = a[0, 0] * c00 + a[0, 1] * c01 + a[0, 2] * c02
    cof = jnp.array([
        [c00,
         a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2],
         a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]],
        [c01,
         a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0],
         a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]],
        [c02,
         a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1],
         a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]],
    ])
    safe = jnp.abs(det) > 1e-30
    inv = cof / jnp.where(safe, det, 1.0)
    return jnp.where(safe, inv, pseudoinv(a))


def inv_diag(a: jax.Array) -> jax.Array:
    """Inverse of a diagonal matrix (reference invD,
    compv_math_matrix.cxx): reciprocal of the diagonal, zeros elsewhere."""
    d = jnp.diagonal(a)
    inv = jnp.where(jnp.abs(d) > 1e-30, 1.0 / d, 0.0)
    return jnp.diag(inv)


def is_colinear_2d(pts: jax.Array, tol: float = 1e-6) -> jax.Array:
    """True if all (N, 2) points lie on one line (reference isColinear2D):
    rank of the centered scatter < 2."""
    c = pts.astype(jnp.float32) - jnp.mean(pts, axis=0)
    s = c.T @ c
    det = s[0, 0] * s[1, 1] - s[0, 1] * s[1, 0]
    return det <= tol * jnp.maximum(jnp.trace(s) ** 2, 1e-12)


def is_colinear_3d(pts: jax.Array, tol: float = 1e-6) -> jax.Array:
    """True if all (N, 3) points lie on one line (reference isColinear3D):
    the centered scatter has <= 1 significant eigenvalue."""
    c = pts.astype(jnp.float32) - jnp.mean(pts, axis=0)
    s = c.T @ c
    vals, _ = eigh_jacobi(s, sweeps=10, sort=True)  # ascending
    return vals[1] <= tol * jnp.maximum(vals[2], 1e-12)


def is_symmetric(a: jax.Array, tol: float = 1e-5) -> jax.Array:
    return jnp.max(jnp.abs(a - a.T)) <= tol


def matrix_rank(a: jax.Array, tol_factor: float = 1e-6) -> jax.Array:
    _, s, _ = svd_via_ata(a)
    return jnp.sum(s > tol_factor * jnp.max(s)).astype(jnp.int32)
