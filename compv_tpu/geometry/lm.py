"""Small dense Levenberg-Marquardt for host-size problems.

Replaces the reference's vendored lmfit/lmmin (thirdparties lmfit-6.1,
driven from calibration at calib_camera.cxx:1030-1170) with an autodiff LM:
the caller provides a jittable residual fn over a flat parameter vector;
Jacobians come from jacfwd; the normal equations are dense (parameter counts
here are tens, not thousands — BA has its own Schur path).
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class LMResult(NamedTuple):
    params: jax.Array
    cost: jax.Array
    iterations: jax.Array


@functools.partial(jax.jit, static_argnames=("residual_fn", "max_iters"))
def levenberg_marquardt(residual_fn: Callable, params0: jax.Array,
                        max_iters: int = 50, lam0: float = 1e-3,
                        lam_up: float = 10.0, lam_down: float = 0.1
                        ) -> LMResult:
    """Minimize 0.5 ||r(p)||^2 over flat params p."""

    def cost(p):
        r = residual_fn(p)
        return 0.5 * jnp.sum(r * r)

    n = params0.shape[0]

    def body(state):
        p, lam, c, it = state
        J = jax.jacfwd(residual_fn)(p)
        r = residual_fn(p)
        H = J.T @ J
        g = J.T @ r
        H = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8))
        delta = -jnp.linalg.solve(H, g)
        p_new = p + delta
        c_new = cost(p_new)
        accept = c_new < c
        return (jnp.where(accept, p_new, p),
                jnp.where(accept, lam * lam_down, lam * lam_up),
                jnp.where(accept, c_new, c),
                it + 1)

    def cond(state):
        _, lam, _, it = state
        return (it < max_iters) & (lam < 1e8)

    p, lam, c, it = jax.lax.while_loop(
        cond, body,
        (params0.astype(jnp.float32), jnp.asarray(lam0, jnp.float32),
         cost(params0.astype(jnp.float32)), jnp.asarray(0, jnp.int32)))
    return LMResult(p, c, it)
