"""Principal component analysis with JSON (de)serialization.

Re-design of CompVMathPCA (base/math/compv_math_pca.cxx, ~350 LoC: fit =
mean + covariance + eigen, project, save/load JSON — tests/math/pca.json).
TPU form: covariance is an MXU matmul; the eigendecomposition reuses the
batched Jacobi solver (geometry/linalg.py) that also powers homography/
calibration.
"""
from __future__ import annotations

import json
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import linalg


class PCAModel(NamedTuple):
    mean: jax.Array         # (D,)
    components: jax.Array   # (K, D) rows = principal axes, strongest first
    explained: jax.Array    # (K,) eigenvalues


def fit(x: jax.Array, k: int, sweeps: int = 16) -> PCAModel:
    """Fit top-k principal components of (N, D) rows (reference
    CompVMathPCA::compute semantics: row observations, column features)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = (xc.T @ xc) / jnp.maximum(x.shape[0] - 1, 1)
    vals, vecs = linalg.eigh_jacobi(cov, sweeps=sweeps, sort=True)
    # eigh_jacobi sorts ascending with eigenvectors in columns; flip to
    # strongest-first rows
    return PCAModel(mean=mean, components=vecs.T[::-1][:k],
                    explained=vals[::-1][:k])


def project(model: PCAModel, x: jax.Array) -> jax.Array:
    """(N, D) -> (N, K) scores (reference CompVMathPCA::project)."""
    return (x.astype(jnp.float32) - model.mean) @ model.components.T


def reconstruct(model: PCAModel, scores: jax.Array) -> jax.Array:
    """(N, K) -> (N, D) back-projection."""
    return scores @ model.components + model.mean


def save(model: PCAModel, path: str) -> None:
    """JSON persistence (reference writes pca.json via CompVJSON)."""
    with open(path, "w") as f:
        json.dump({
            "mean": np.asarray(model.mean).tolist(),
            "components": np.asarray(model.components).tolist(),
            "explained": np.asarray(model.explained).tolist(),
        }, f)


def load(path: str) -> PCAModel:
    with open(path) as f:
        d = json.load(f)
    return PCAModel(mean=jnp.asarray(d["mean"], jnp.float32),
                    components=jnp.asarray(d["components"], jnp.float32),
                    explained=jnp.asarray(d["explained"], jnp.float32))
