"""C-SVC support vector machine (binary + one-vs-one multiclass).

Re-design of the reference's libsvm-3.22 wrapper (base/ml/
compv_base_ml_svm.cxx, API at base/include/compv/base/ml/compv_base_ml_svm.h:
78-104: train / predict{,Distance} / save / load / crossValidation, RBF
kernel with SIMD batch eval). libsvm's SMO picks two coordinates per step —
inherently serial. TPU-native solver: projected-gradient ascent on the dual
QP over the FULL alpha vector per step; the gradient is one MXU matmul
(Q @ alpha), the box/equality projection is elementwise + one psum-style
reduction. Converges to the same dual optimum; every step is dense and
batched.

Predict: decision(x) = sum_i alpha_i y_i K(x_i, x) + b — a kernel matmul.
"""
from __future__ import annotations

import json
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


def rbf_kernel(a: jax.Array, b: jax.Array, gamma: float) -> jax.Array:
    """(N, D) x (M, D) -> (N, M) exp(-gamma * ||a - b||^2): one MXU matmul
    plus rank-1 norms (the reference's SIMD rbf batch eval, ml_svm RBF)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True)
    sq = jnp.maximum(aa + bb.T - 2.0 * (a @ b.T), 0.0)
    return jnp.exp(-gamma * sq)


def linear_kernel(a: jax.Array, b: jax.Array, gamma: float = 0.0) -> jax.Array:
    return a.astype(jnp.float32) @ b.astype(jnp.float32).T


_KERNELS = {"rbf": rbf_kernel, "linear": linear_kernel}


class SVMModel(NamedTuple):
    support: jax.Array      # (S, D) support vectors
    coef: jax.Array         # (S,) alpha_i * y_i
    bias: jax.Array         # ()
    gamma: float
    kernel: str
    classes: jax.Array      # (2,) original labels


def _project_box_plane(a: jax.Array, y: jax.Array, c: float) -> jax.Array:
    """EXACT Euclidean projection onto {0 <= a <= C, yᵀa = 0}: the KKT
    form is clip(a - lam*y, 0, C) with lam solving yᵀclip(a - lam*y) = 0,
    which is monotone nonincreasing in lam — 50 bisection steps find it
    to f32 precision. (Round 3 fix: the previous 10-round alternating
    box/plane projection is NOT the intersection projection, and the
    solver stalled at a 17% duality gap that no iteration count could
    close — measured on digits 3-vs-8, tests/test_svm_rigor.py.)"""
    bound = jnp.max(jnp.abs(a)) + c + 1.0

    def body(_, lh):
        lo, hi = lh
        mid = 0.5 * (lo + hi)
        g = jnp.sum(y * jnp.clip(a - mid * y, 0.0, c))
        return (jnp.where(g > 0, mid, lo), jnp.where(g > 0, hi, mid))

    lo, hi = jax.lax.fori_loop(0, 50, body, (-bound, bound))
    lam = 0.5 * (lo + hi)
    return jnp.clip(a - lam * y, 0.0, c)


def _solve_dual(k: jax.Array, y: jax.Array, c: float, iters: int,
                tol: float) -> jax.Array:
    """Maximize sum(a) - 0.5 aᵀQa  s.t. 0 <= a <= C, yᵀa = 0, Q = y yᵀ * K.
    FISTA-accelerated projected gradient ascent with the EXACT
    box-plane projection (duality gap checked against real libsvm in
    tests/test_svm_rigor.py)."""
    n = y.shape[0]
    q = (y[:, None] * y[None, :]) * k
    # step <= 1/lambda_max(Q); Gershgorin bound: max row sum of |Q|
    lr = 1.0 / jnp.maximum(jnp.max(jnp.sum(jnp.abs(q), axis=1)), 1e-8)

    def step(t, carry):
        a, a_prev = carry
        # FISTA momentum on the projected ascent
        beta = t / (t + 3.0)
        z = a + beta * (a - a_prev)
        grad = 1.0 - q @ z
        return (_project_box_plane(z + lr * grad, y, c), a)

    a0 = jnp.full((n,), min(c * 0.5, 1e-2), jnp.float32)
    a0 = _project_box_plane(a0, y, c)
    a, _ = jax.lax.fori_loop(0, iters, step, (a0, a0))
    return a


def train(x: jax.Array, y: jax.Array, c: float = 1.0,
          gamma: Optional[float] = None, kernel: str = "rbf",
          iters: int = 2000, tol: float = 1e-6) -> SVMModel:
    """Train binary C-SVC. `y` holds two arbitrary labels (reference accepts
    int labels). gamma default = 1/(D * var(x)), libsvm's 'scale'."""
    x = jnp.asarray(x, jnp.float32)
    yl = np.asarray(y)
    classes = np.unique(yl)
    assert classes.shape[0] == 2, "binary SVC (use train_multiclass)"
    ypm = jnp.where(jnp.asarray(yl == classes[1]), 1.0, -1.0)
    if gamma is None:
        gamma = float(1.0 / (x.shape[1] * jnp.var(x)))
    kmat = _KERNELS[kernel](x, x, gamma)
    alpha = _solve_dual(kmat, ypm, c, iters, tol)
    sv = alpha > 1e-6
    coef = alpha * ypm
    # bias from margin vectors (0 < alpha < C)
    margin = sv & (alpha < c - 1e-6)
    decis = kmat @ coef
    nb = jnp.maximum(jnp.sum(margin), 1)
    bias = jnp.sum(jnp.where(margin, ypm - decis, 0.0)) / nb
    keep = np.asarray(sv)
    return SVMModel(support=x[jnp.asarray(keep)],
                    coef=coef[jnp.asarray(keep)],
                    bias=bias, gamma=gamma, kernel=kernel,
                    classes=jnp.asarray(classes))


def decision(model: SVMModel, x: jax.Array) -> jax.Array:
    """(N,) signed distances (reference predictDistance)."""
    k = _KERNELS[model.kernel](jnp.asarray(x, jnp.float32), model.support,
                               model.gamma)
    return k @ model.coef + model.bias


def predict(model: SVMModel, x: jax.Array) -> jax.Array:
    """(N,) predicted labels (reference predict)."""
    d = decision(model, x)
    return jnp.where(d >= 0, model.classes[1], model.classes[0])


class SVMMulticlass(NamedTuple):
    models: tuple          # one binary SVMModel per class pair
    pairs: tuple           # ((ci, cj), ...) original labels per model
    classes: tuple


def train_multiclass(x: jax.Array, y, **train_kw) -> SVMMulticlass:
    """One-vs-one multiclass C-SVC (libsvm's scheme, which the reference
    wraps): k(k-1)/2 binary machines + majority vote."""
    x = jnp.asarray(x, jnp.float32)
    yl = np.asarray(y)
    classes = tuple(np.unique(yl).tolist())
    models, pairs = [], []
    for i in range(len(classes)):
        for j in range(i + 1, len(classes)):
            sel = (yl == classes[i]) | (yl == classes[j])
            models.append(train(x[jnp.asarray(sel)], yl[sel], **train_kw))
            pairs.append((classes[i], classes[j]))
    return SVMMulticlass(models=tuple(models), pairs=tuple(pairs),
                         classes=classes)


def predict_multiclass(mc: SVMMulticlass, x: jax.Array) -> np.ndarray:
    """(N,) labels by pairwise vote."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    cls_index = {c: k for k, c in enumerate(mc.classes)}
    votes = np.zeros((n, len(mc.classes)), np.int32)
    for model, (ci, cj) in zip(mc.models, mc.pairs):
        pred = np.asarray(predict(model, x))
        votes[:, cls_index[ci]] += pred == ci
        votes[:, cls_index[cj]] += pred == cj
    return np.asarray([mc.classes[k] for k in votes.argmax(1)])


def cross_validate(x, y, folds: int = 5, seed: int = 0, **train_kw) -> float:
    """K-fold accuracy (reference crossValidation, ml_svm.h:97)."""
    x = np.asarray(x)
    y = np.asarray(y)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(x.shape[0])
    splits = np.array_split(perm, folds)
    correct = total = 0
    for i in range(folds):
        test_idx = splits[i]
        train_idx = np.concatenate([splits[j] for j in range(folds) if j != i])
        m = train(jnp.asarray(x[train_idx]), y[train_idx], **train_kw)
        pred = np.asarray(predict(m, jnp.asarray(x[test_idx])))
        correct += int((pred == y[test_idx]).sum())
        total += test_idx.shape[0]
    return correct / total


def save(model: SVMModel, path: str) -> None:
    with open(path, "w") as f:
        json.dump({
            "support": np.asarray(model.support).tolist(),
            "coef": np.asarray(model.coef).tolist(),
            "bias": float(model.bias),
            "gamma": model.gamma,
            "kernel": model.kernel,
            "classes": np.asarray(model.classes).tolist(),
        }, f)


def load(path: str) -> SVMModel:
    with open(path) as f:
        d = json.load(f)
    return SVMModel(support=jnp.asarray(d["support"], jnp.float32),
                    coef=jnp.asarray(d["coef"], jnp.float32),
                    bias=jnp.asarray(d["bias"], jnp.float32),
                    gamma=d["gamma"], kernel=d["kernel"],
                    classes=jnp.asarray(d["classes"]))
