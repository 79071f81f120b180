"""Geometry tests: Jacobi eigen, SVD/pseudoinv, RANSAC, homography."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compv_tpu.geometry import homography, linalg, ransac, transform
from compv_tpu.core.config import RansacConfig


class TestLinalg:
    def test_eigh_jacobi_vs_numpy(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(9, 9)).astype(np.float32)
        s = a @ a.T
        w, v = linalg.eigh_jacobi(jnp.asarray(s))
        w_np = np.linalg.eigvalsh(s)
        np.testing.assert_allclose(np.asarray(w), w_np, rtol=2e-4, atol=2e-3)
        # eigenvector property: S v = w v
        res = s @ np.asarray(v) - np.asarray(v) * np.asarray(w)[None, :]
        assert np.abs(res).max() < 2e-2

    def test_eigh_batched(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(16, 6, 6)).astype(np.float32)
        s = a @ np.swapaxes(a, 1, 2)
        w, _ = linalg.eigh_batched(jnp.asarray(s))
        w_np = np.linalg.eigvalsh(s)
        np.testing.assert_allclose(np.asarray(w), w_np, rtol=2e-4, atol=2e-3)

    def test_svd_reconstruction(self):
        rng = np.random.default_rng(2)
        a = rng.normal(size=(8, 5)).astype(np.float32)
        u, s, vt = linalg.svd_via_ata(jnp.asarray(a))
        rec = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(vt)
        np.testing.assert_allclose(rec, a, atol=2e-4)

    def test_pseudoinv(self):
        rng = np.random.default_rng(3)
        a = rng.normal(size=(6, 4)).astype(np.float32)
        pinv = np.asarray(linalg.pseudoinv(jnp.asarray(a)))
        np.testing.assert_allclose(pinv @ a, np.eye(4), atol=1e-3)

    def test_inv3x3(self):
        rng = np.random.default_rng(4)
        a = rng.normal(size=(3, 3)).astype(np.float32) + 2 * np.eye(3, dtype=np.float32)
        inv = np.asarray(linalg.inv3x3(jnp.asarray(a)))
        np.testing.assert_allclose(inv @ a, np.eye(3), atol=1e-4)

    def test_matrix_rank(self):
        a = np.zeros((5, 5), np.float32)
        a[0, 0] = a[1, 1] = 1.0
        assert int(linalg.matrix_rank(jnp.asarray(a))) == 2


class TestTransform:
    def test_perspective_identity(self):
        pts = jnp.asarray(np.random.default_rng(0).normal(size=(10, 2)), jnp.float32)
        out = transform.perspective2d(pts, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-6)

    def test_perspective_translation(self):
        pts = jnp.zeros((4, 2))
        h = jnp.asarray([[1, 0, 3], [0, 1, -2], [0, 0, 1]], jnp.float32)
        out = transform.perspective2d(pts, h)
        np.testing.assert_allclose(np.asarray(out), [[3, -2]] * 4, atol=1e-6)


def _make_homography_problem(rng, n=200, outlier_frac=0.3, noise=0.5):
    h_true = np.array([[1.1, 0.05, 10.0],
                       [-0.03, 0.95, -5.0],
                       [1e-4, -2e-5, 1.0]], np.float32)
    src = rng.uniform(20, 600, size=(n, 2)).astype(np.float32)
    ones = np.ones((n, 1), np.float32)
    dst_h = np.concatenate([src, ones], axis=1) @ h_true.T
    dst = dst_h[:, :2] / dst_h[:, 2:3]
    dst += rng.normal(0, noise, dst.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    dst[:n_out] = rng.uniform(0, 640, size=(n_out, 2))
    return h_true, src, dst, n_out


class TestHomography:
    def test_compute_h_exact_on_clean_points(self):
        rng = np.random.default_rng(5)
        h_true, src, dst, _ = _make_homography_problem(rng, 50, 0.0, 0.0)
        h = np.asarray(homography.compute_h(jnp.asarray(src), jnp.asarray(dst)))
        np.testing.assert_allclose(h, h_true / h_true[2, 2], rtol=2e-3, atol=2e-3)

    def test_ransac_rejects_outliers(self):
        rng = np.random.default_rng(6)
        h_true, src, dst, n_out = _make_homography_problem(rng, 200, 0.3, 0.3)
        res = homography.find_homography(
            jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
            config=RansacConfig(max_iters=2048, batch=128, threshold=9.0))
        assert int(res.num_inliers) > 120
        # transfer error of true inliers under recovered H must be small
        h = np.asarray(res.h)
        pts = np.concatenate([src[n_out:], np.ones((200 - n_out, 1), np.float32)], 1)
        proj = pts @ h.T
        proj = proj[:, :2] / proj[:, 2:3]
        err = np.linalg.norm(proj - dst[n_out:], axis=1)
        assert np.median(err) < 1.5

    def test_valid_mask_excludes_padding(self):
        rng = np.random.default_rng(7)
        h_true, src, dst, _ = _make_homography_problem(rng, 64, 0.0, 0.1)
        # pad with garbage rows marked invalid
        src_p = np.concatenate([src, rng.uniform(0, 1, (32, 2)).astype(np.float32)])
        dst_p = np.concatenate([dst, rng.uniform(0, 1, (32, 2)).astype(np.float32)])
        valid = np.concatenate([np.ones(64, bool), np.zeros(32, bool)])
        res = homography.find_homography(
            jax.random.PRNGKey(1), jnp.asarray(src_p), jnp.asarray(dst_p),
            valid_mask=jnp.asarray(valid),
            config=RansacConfig(max_iters=1024, batch=128))
        mask = np.asarray(res.inlier_mask)
        assert not mask[64:].any()
        assert mask[:64].sum() > 48


class TestRansacEngine:
    def test_line_fit(self):
        """Fit y = 2x + 1 with 40% outliers via the generic engine (the
        reference uses the same engine for line/parabola fitting,
        compv_math_stats_fit.cxx)."""
        rng = np.random.default_rng(8)
        n = 256
        x = rng.uniform(-10, 10, n).astype(np.float32)
        y = 2.0 * x + 1.0 + rng.normal(0, 0.1, n).astype(np.float32)
        bad = rng.random(n) < 0.4
        y[bad] = rng.uniform(-30, 30, bad.sum())
        data = jnp.asarray(np.stack([x, y], 1))

        def build_model(sub):
            (x1, y1), (x2, y2) = sub[0], sub[1]
            a = (y2 - y1) / jnp.where(jnp.abs(x2 - x1) < 1e-9, 1e-9, x2 - x1)
            b = y1 - a * x1
            return jnp.stack([a, b])

        def residuals(m, d):
            pred = m[0] * d[:, 0] + m[1]
            return (pred - d[:, 1]) ** 2

        res = ransac.ransac(jax.random.PRNGKey(2), data, build_model,
                            residuals, sample_size=2,
                            config=RansacConfig(max_iters=1024, batch=64,
                                                threshold=0.25))
        a, b = np.asarray(res.model)
        assert abs(a - 2.0) < 0.05 and abs(b - 1.0) < 0.2
        assert int(res.num_inliers) > 0.5 * (~bad).sum()

    def test_adaptive_early_exit(self):
        """Clean data -> should stop after far fewer than max_iters."""
        rng = np.random.default_rng(9)
        x = rng.uniform(-5, 5, 128).astype(np.float32)
        data = jnp.asarray(np.stack([x, 3 * x], 1))

        def build_model(sub):
            a = sub[1, 1] - sub[0, 1]
            b = sub[1, 0] - sub[0, 0]
            return jnp.stack([a / jnp.where(jnp.abs(b) < 1e-9, 1e-9, b)])

        def residuals(m, d):
            return (m[0] * d[:, 0] - d[:, 1]) ** 2

        res = ransac.ransac(jax.random.PRNGKey(3), data, build_model,
                            residuals, sample_size=2,
                            config=RansacConfig(max_iters=100000, batch=32))
        assert int(res.iterations) <= 64  # 1-2 rounds
