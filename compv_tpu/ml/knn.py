"""K-nearest-neighbour index: build / save / load / search.

Re-design of the reference's Annoy wrapper (base/include/compv/base/ml/
compv_base_ml_knn.h:26-45 — build(trees)/save/load/search(k)). Annoy's
random-projection trees exist to dodge O(N·D) scans on CPUs; on TPU an exact
scan IS the fast path: one (Q, D) x (D, N) MXU matmul scores every corpus
row, and iterated argmin extracts the k best (same trick as
matchers/bruteforce.py). Exact results, no index build time, no recall loss.
"""
from __future__ import annotations

import json
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class KNNIndex(NamedTuple):
    vectors: jax.Array    # (N, D) float32
    labels: jax.Array     # (N,) int32 user ids
    metric: str           # "l2" | "cosine" | "dot"


def build(vectors: jax.Array, labels=None, metric: str = "l2") -> KNNIndex:
    """Reference CompVMachineLearningKNN::build — here a no-op wrap (the MXU
    scan needs no tree construction)."""
    v = jnp.asarray(vectors, jnp.float32)
    if labels is None:
        labels = jnp.arange(v.shape[0], dtype=jnp.int32)
    if metric == "cosine":
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    return KNNIndex(vectors=v, labels=jnp.asarray(labels, jnp.int32),
                    metric=metric)


def search(index: KNNIndex, queries: jax.Array, k: int = 1
           ) -> Tuple[jax.Array, jax.Array]:
    """((Q, k) labels, (Q, k) distances). Exact (reference search is
    approximate; exactness is strictly better for identical API)."""
    q = jnp.asarray(queries, jnp.float32)
    if q.ndim == 1:
        q = q[None]
    v = index.vectors
    if index.metric == "cosine":
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        d = 1.0 - q @ v.T
    elif index.metric == "dot":
        d = -(q @ v.T)
    else:  # l2
        qq = jnp.sum(q * q, axis=1, keepdims=True)
        vv = jnp.sum(v * v, axis=1, keepdims=True)
        d = jnp.maximum(qq + vv.T - 2.0 * (q @ v.T), 0.0)
    cols = jnp.arange(d.shape[1], dtype=jnp.int32)[None, :]
    idxs, dists = [], []
    for _ in range(k):
        best = jnp.argmin(d, axis=1).astype(jnp.int32)
        idxs.append(index.labels[best])
        dists.append(jnp.take_along_axis(d, best[:, None], axis=1)[:, 0])
        d = jnp.where(cols == best[:, None], jnp.inf, d)
    dist = jnp.stack(dists, axis=1)
    if index.metric == "l2":
        dist = jnp.sqrt(dist)
    return jnp.stack(idxs, axis=1), dist


def save(index: KNNIndex, path: str) -> None:
    with open(path, "w") as f:
        json.dump({
            "vectors": np.asarray(index.vectors).tolist(),
            "labels": np.asarray(index.labels).tolist(),
            "metric": index.metric,
        }, f)


def load(path: str) -> KNNIndex:
    with open(path) as f:
        d = json.load(f)
    return KNNIndex(vectors=jnp.asarray(d["vectors"], jnp.float32),
                    labels=jnp.asarray(d["labels"], jnp.int32),
                    metric=d["metric"])
