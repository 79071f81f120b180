"""SVM solver rigor (round-2 VERDICT weakness 7): compare against REAL
libsvm (sklearn.svm.SVC wraps it — the same library the reference vendors,
base/ml/compv_base_ml_svm.cxx) on a standard dataset, and check the
duality gap of our projected-ascent dual solver instead of trusting a
fixed iteration count.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.ml import svm

sk_svm = pytest.importorskip("sklearn.svm")
from sklearn.datasets import load_digits


def _digits_pair(a=3, b=8, n_train=120, n_test=80):
    d = load_digits()
    m = (d.target == a) | (d.target == b)
    x, y = d.data[m] / 16.0, d.target[m]
    rng = np.random.default_rng(0)
    idx = rng.permutation(x.shape[0])
    x, y = x[idx], y[idx]
    return (x[:n_train].astype(np.float32), y[:n_train],
            x[n_train:n_train + n_test].astype(np.float32),
            y[n_train:n_train + n_test])


class TestVsLibsvm:
    def test_binary_digits_accuracy_parity(self):
        """3-vs-8 digits, same C/gamma: accuracy within 3% of libsvm."""
        xtr, ytr, xte, yte = _digits_pair()
        gamma = 1.0 / (xtr.shape[1] * xtr.var())
        ref = sk_svm.SVC(C=1.0, kernel="rbf", gamma=gamma).fit(xtr, ytr)
        acc_ref = (ref.predict(xte) == yte).mean()
        model = svm.train(jnp.asarray(xtr), ytr, c=1.0, gamma=gamma)
        acc = (np.asarray(svm.predict(model, jnp.asarray(xte))) ==
               yte).mean()
        assert acc_ref >= 0.95          # sanity: the task is easy
        assert acc >= acc_ref - 0.03, (acc, acc_ref)

    def test_decision_sign_agreement(self):
        xtr, ytr, xte, yte = _digits_pair()
        gamma = 1.0 / (xtr.shape[1] * xtr.var())
        ref = sk_svm.SVC(C=1.0, kernel="rbf", gamma=gamma).fit(xtr, ytr)
        model = svm.train(jnp.asarray(xtr), ytr, c=1.0, gamma=gamma)
        ours = np.asarray(svm.decision(model, jnp.asarray(xte)))
        # sklearn's decision_function sign convention follows classes_
        # order, same as ours (classes[1] positive)
        agree = (np.sign(ours) == np.sign(ref.decision_function(xte)))
        assert agree.mean() >= 0.97, agree.mean()

    def test_multiclass_digits_accuracy_parity(self):
        d = load_digits()
        keep = d.target < 5
        x, y = (d.data[keep] / 16.0).astype(np.float32), d.target[keep]
        rng = np.random.default_rng(1)
        idx = rng.permutation(x.shape[0])[:400]
        x, y = x[idx], y[idx]
        xtr, ytr, xte, yte = x[:300], y[:300], x[300:], y[300:]
        gamma = 1.0 / (xtr.shape[1] * xtr.var())
        ref = sk_svm.SVC(C=1.0, kernel="rbf", gamma=gamma).fit(xtr, ytr)
        acc_ref = (ref.predict(xte) == yte).mean()
        mc = svm.train_multiclass(jnp.asarray(xtr), ytr, c=1.0,
                                  gamma=gamma)
        acc = (svm.predict_multiclass(mc, jnp.asarray(xte)) == yte).mean()
        assert acc >= acc_ref - 0.05, (acc, acc_ref)


class TestDualityGap:
    def test_gap_small_on_standard_problem(self):
        """Relative primal-dual gap of the solver's alpha must be small —
        the convergence evidence a fixed iteration count alone lacks."""
        xtr, ytr, _, _ = _digits_pair(n_train=150, n_test=1)
        gamma = 1.0 / (xtr.shape[1] * xtr.var())
        c = 1.0
        x = jnp.asarray(xtr)
        ypm = np.where(ytr == np.unique(ytr)[1], 1.0, -1.0)
        kmat = svm.rbf_kernel(x, x, gamma)
        alpha = np.asarray(svm._solve_dual(
            kmat, jnp.asarray(ypm, jnp.float32), c, 2000, 1e-6))
        q = (ypm[:, None] * ypm[None, :]) * np.asarray(kmat)
        dual = alpha.sum() - 0.5 * alpha @ q @ alpha
        # primal with the same alpha: f(x_i) = sum_j a_j y_j K(i,j) + b
        f = np.asarray(kmat) @ (alpha * ypm)
        margin = (alpha > 1e-6) & (alpha < c - 1e-6)
        b = float(np.mean((ypm - f)[margin])) if margin.any() else 0.0
        hinge = np.maximum(0.0, 1.0 - ypm * (f + b)).sum()
        primal = 0.5 * alpha @ q @ alpha + c * hinge
        gap = (primal - dual) / max(abs(primal), 1e-9)
        assert gap >= -1e-3              # weak duality sanity
        assert gap <= 0.05, gap          # converged to ~5% of optimum
