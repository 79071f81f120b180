"""Generic vectorized RANSAC engine.

Re-design of CompVMathStatsRansac (base/math/compv_math_stats_ransac.cxx:
21-296): the reference runs maxIter/numThreads serial hypotheses per thread
with a shared early-exit flag. TPU-native form: score a *batch* of B
hypotheses per device step (vmap over minimal-set sampling + model build +
residuals), keep the argmax, and iterate rounds under lax.while_loop with the
reference's adaptive trial bound  N = log(1-p) / log(1 - (1-e)^s)
(stats_ransac.cxx:240-253) evaluated on the running best inlier ratio.

Caller provides two jittable callbacks, mirroring the reference's
CompVMathStatsRansacControl build_model_params/build_residuals:
  build_model(pts: (s, d)) -> model pytree (possibly invalid -> NaNs)
  residuals(model, data: (N, d)) -> (N,) squared errors
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.config import RansacConfig


class RansacResult(NamedTuple):
    model: object            # best model pytree
    inlier_mask: jax.Array   # (N,) bool
    num_inliers: jax.Array   # () int32
    iterations: jax.Array    # () int32 — hypotheses actually scored
    # () bool — False when no hypothesis scored more than sample_size
    # inliers (a minimal set trivially fits itself, so <= sample_size
    # means every model was degenerate or the data is pure noise): `model`
    # is then garbage and MUST NOT be consumed (docs/API.md "failure
    # convention"; reference analogue: stats_ransac.cxx returning an
    # empty inlier set)
    found: jax.Array = True


def ransac(key: jax.Array,
           data: jax.Array,
           build_model: Callable,
           residuals: Callable,
           sample_size: int,
           config: RansacConfig = RansacConfig(),
           valid_mask: jax.Array = None) -> RansacResult:
    """Run vectorized RANSAC over (N, d) data rows.

    ``valid_mask`` masks padded rows (they never count as inliers and are
    never sampled with probability mass — implemented by biasing sampling
    toward valid rows via gumbel-top-k on the mask).
    """
    n = data.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)
    nvalid = jnp.maximum(jnp.sum(valid_mask), sample_size)
    batch = config.batch
    max_rounds = max(1, -(-config.max_iters // batch))  # ceil

    def sample_minimal_sets(k):
        """(batch, sample_size) distinct row indices biased to valid rows:
        per hypothesis, take top-s of (uniform gumbel + valid bias)."""
        g = jax.random.gumbel(k, (batch, n))
        g = jnp.where(valid_mask[None, :], g, -jnp.inf)
        _, idx = jax.lax.top_k(g, sample_size)
        return idx

    def score_batch(k):
        idx = sample_minimal_sets(k)
        subsets = data[idx]                       # (batch, s, d)
        models = jax.vmap(build_model)(subsets)   # pytree with (batch, ...)
        res = jax.vmap(lambda m: residuals(m, data))(models)  # (batch, N)
        ok = (res <= config.threshold) & valid_mask[None, :]
        counts = jnp.sum(ok, axis=1)
        # NaN-model guard: residuals NaN -> ok False already (NaN <= t False)
        best = jnp.argmax(counts)
        best_model = jax.tree.map(lambda x: x[best], models)
        return best_model, counts[best], ok[best]

    class Carry(NamedTuple):
        key: jax.Array
        best_model: object
        best_count: jax.Array
        best_mask: jax.Array
        rounds: jax.Array

    k0, key = jax.random.split(key)
    m0, c0, mask0 = score_batch(k0)
    carry = Carry(key, m0, c0, mask0, jnp.asarray(1, jnp.int32))

    log_1mp = jnp.log(jnp.asarray(1.0 - config.confidence, jnp.float32))

    def needed_rounds(best_count):
        """Adaptive bound on hypotheses given current inlier ratio,
        reference semantics (stats_ransac.cxx:240-253)."""
        ratio = best_count.astype(jnp.float32) / nvalid.astype(jnp.float32)
        p_good = jnp.clip(ratio ** sample_size, 1e-9, 1.0 - 1e-6)
        trials = log_1mp / jnp.log(1.0 - p_good)
        return jnp.ceil(trials / batch).astype(jnp.int32)

    def cond(c: Carry):
        return (c.rounds < max_rounds) & (c.rounds < needed_rounds(c.best_count))

    def body(c: Carry):
        k, key = jax.random.split(c.key)
        m, cnt, mask = score_batch(k)
        better = cnt > c.best_count
        best_model = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(better, (1,) * old.ndim), new, old) if old.ndim
            else jnp.where(better, new, old),
            m, c.best_model)
        return Carry(key,
                     best_model,
                     jnp.where(better, cnt, c.best_count),
                     jnp.where(better, mask, c.best_mask),
                     c.rounds + 1)

    carry = jax.lax.while_loop(cond, body, carry)
    return RansacResult(model=carry.best_model,
                        inlier_mask=carry.best_mask,
                        num_inliers=carry.best_count,
                        iterations=carry.rounds * batch,
                        found=carry.best_count > sample_size)
