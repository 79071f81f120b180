"""Deterministic PRNG policy.

The reference seeds RANSAC from std::random_device per call
(core/calib/compv_core_calib_homography.cxx:224-227), which its own comments
note is untestable. We instead thread explicit jax.random keys through every
randomized algorithm; all defaults are reproducible.
"""
from __future__ import annotations

import jax


def default_key(seed: int = 0) -> jax.Array:
    return jax.random.PRNGKey(seed)


def split(key: jax.Array, n: int = 2):
    return jax.random.split(key, n)
