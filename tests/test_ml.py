"""ML layer tests: PCA / SVM / KNN (reference base/ml + math/pca tests:
tests/math/pca.json drive, svm tests in tests/math)."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.ml import knn, pca, svm


class TestPCA:
    def test_fit_project_reconstruct(self, rng):
        # low-rank data: 2 strong directions in 6-D
        basis = rng.normal(size=(2, 6))
        scores = rng.normal(size=(200, 2)) * np.asarray([5.0, 2.0])
        x = scores @ basis + 0.01 * rng.normal(size=(200, 6)) + 3.0
        m = pca.fit(jnp.asarray(x, jnp.float32), k=2)
        proj = pca.project(m, jnp.asarray(x, jnp.float32))
        rec = pca.reconstruct(m, proj)
        err = np.abs(np.asarray(rec) - x).max()
        assert err < 0.2, err
        assert float(m.explained[0]) >= float(m.explained[1]) > 0

    def test_matches_numpy_eig(self, rng):
        x = rng.normal(size=(100, 4)).astype(np.float32)
        m = pca.fit(jnp.asarray(x), k=4)
        cov = np.cov(x.T)
        w = np.sort(np.linalg.eigvalsh(cov))[::-1]
        np.testing.assert_allclose(np.asarray(m.explained), w, rtol=1e-3)

    def test_save_load_roundtrip(self, rng, tmp_path):
        x = rng.normal(size=(50, 5)).astype(np.float32)
        m = pca.fit(jnp.asarray(x), k=3)
        p = str(tmp_path / "pca.json")
        pca.save(m, p)
        m2 = pca.load(p)
        np.testing.assert_allclose(np.asarray(m.components),
                                   np.asarray(m2.components), atol=1e-6)


def _two_blobs(rng, n=120, sep=3.0):
    x0 = rng.normal(size=(n // 2, 2)) + [-sep / 2, 0]
    x1 = rng.normal(size=(n // 2, 2)) + [sep / 2, 0]
    x = np.concatenate([x0, x1]).astype(np.float32)
    y = np.concatenate([np.zeros(n // 2), np.ones(n // 2)]).astype(np.int32)
    return x, y


class TestSVM:
    def test_linearly_separable(self):
        x, y = _two_blobs(np.random.default_rng(1), sep=6.0)
        m = svm.train(jnp.asarray(x), y, c=1.0, kernel="rbf")
        pred = np.asarray(svm.predict(m, jnp.asarray(x)))
        assert (pred == y).mean() > 0.97

    def test_nonlinear_xor(self):
        # RBF must solve XOR (linear cannot); local rng: data must not
        # depend on which tests consumed the session generator earlier
        rng = np.random.default_rng(42)
        n = 200
        x = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        y = ((x[:, 0] * x[:, 1]) > 0).astype(np.int32)
        m = svm.train(jnp.asarray(x), y, c=50.0, gamma=10.0, kernel="rbf",
                      iters=4000)
        pred = np.asarray(svm.predict(m, jnp.asarray(x)))
        assert (pred == y).mean() > 0.95

    def test_decision_sign_consistency(self, rng):
        x, y = _two_blobs(rng)
        m = svm.train(jnp.asarray(x), y)
        d = np.asarray(svm.decision(m, jnp.asarray(x)))
        pred = np.asarray(svm.predict(m, jnp.asarray(x)))
        assert ((d >= 0) == (pred == 1)).all()

    def test_save_load_roundtrip(self, rng, tmp_path):
        x, y = _two_blobs(rng)
        m = svm.train(jnp.asarray(x), y)
        p = str(tmp_path / "svm.json")
        svm.save(m, p)
        m2 = svm.load(p)
        np.testing.assert_allclose(
            np.asarray(svm.decision(m, jnp.asarray(x[:10]))),
            np.asarray(svm.decision(m2, jnp.asarray(x[:10]))), atol=1e-5)

    def test_cross_validation(self):
        x, y = _two_blobs(np.random.default_rng(2), sep=6.0)
        acc = svm.cross_validate(x, y, folds=3, c=1.0)
        assert acc > 0.9


class TestKNN:
    def test_exact_l2(self):
        # local generator: order-independent data (the shared session rng's
        # state depends on which tests ran before)
        rng = np.random.default_rng(7)
        v = rng.normal(size=(300, 16)).astype(np.float32)
        idx = knn.build(jnp.asarray(v))
        q = v[17:20] + 1e-4
        labels, dists = knn.search(idx, jnp.asarray(q), k=3)
        assert list(np.asarray(labels)[:, 0]) == [17, 18, 19]
        # distances match numpy brute force (f32 ||a||^2+||b||^2-2ab form
        # carries ~2e-3 cancellation error vs numpy's f64 direct norm)
        want = np.sort(np.linalg.norm(v[None] - q[:, None], axis=2), axis=1)
        np.testing.assert_allclose(np.asarray(dists), want[:, :3], atol=5e-3)

    def test_cosine(self, rng):
        v = rng.normal(size=(50, 8)).astype(np.float32)
        idx = knn.build(jnp.asarray(v), metric="cosine")
        labels, dists = knn.search(idx, jnp.asarray(3.0 * v[7]), k=1)
        assert int(labels[0, 0]) == 7
        assert float(dists[0, 0]) < 1e-5

    def test_save_load_roundtrip(self, rng, tmp_path):
        v = rng.normal(size=(40, 4)).astype(np.float32)
        idx = knn.build(jnp.asarray(v), labels=jnp.arange(40) * 10)
        p = str(tmp_path / "knn.json")
        knn.save(idx, p)
        idx2 = knn.load(p)
        l1, _ = knn.search(idx, jnp.asarray(v[5]), k=2)
        l2, _ = knn.search(idx2, jnp.asarray(v[5]), k=2)
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


class TestSVMMulticlass:
    def test_three_blobs(self):
        rng = np.random.default_rng(3)
        centers = np.array([[0, 0], [6, 0], [0, 6]])
        x = np.concatenate([rng.normal(size=(60, 2)) + c for c in centers]
                           ).astype(np.float32)
        y = np.repeat([0, 1, 2], 60).astype(np.int32)
        mc = svm.train_multiclass(jnp.asarray(x), y, c=1.0)
        assert len(mc.models) == 3  # 3 choose 2
        pred = svm.predict_multiclass(mc, jnp.asarray(x))
        assert (pred == y).mean() > 0.95
