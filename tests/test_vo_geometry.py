"""Essential matrix + PnP tests on synthetic two-view geometry."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compv_tpu.core.config import RansacConfig
from compv_tpu.geometry import essential
from compv_tpu.slam import camera, pnp


@pytest.fixture(scope="module")
def two_view():
    rng = np.random.default_rng(0)
    intr = camera.Intrinsics.make(500.0, 500.0, 320.0, 240.0)
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], (200, 3)).astype(np.float32)
    wt1 = np.zeros(6, np.float32)
    wt2 = np.array([0.02, -0.06, 0.01, -0.6, 0.05, 0.1], np.float32)
    uv1 = np.array(camera.project_batch(jnp.asarray(wt1), intr, jnp.asarray(pts)))
    uv2 = np.array(camera.project_batch(jnp.asarray(wt2), intr, jnp.asarray(pts)))
    uv1 += rng.normal(0, 0.3, uv1.shape)
    uv2 += rng.normal(0, 0.3, uv2.shape)
    return intr, pts, wt1, wt2, uv1.astype(np.float32), uv2.astype(np.float32)


class TestEssential:
    def test_recovers_relative_motion(self, two_view):
        intr, pts, wt1, wt2, uv1, uv2 = two_view
        res = essential.find_essential(
            jax.random.PRNGKey(0), jnp.asarray(uv1), jnp.asarray(uv2), intr,
            config=RansacConfig(max_iters=1024, batch=128, threshold=2e-5))
        assert int(res.num_inliers) > 150
        x1 = essential._normalize_pixels(jnp.asarray(uv1), intr)
        x2 = essential._normalize_pixels(jnp.asarray(uv2), intr)
        r, t = essential.decompose_essential(res.e, x1, x2, res.inlier_mask)
        r_true = np.asarray(camera.so3_exp(jnp.asarray(wt2[:3])))
        t_true = wt2[3:] / np.linalg.norm(wt2[3:])
        # rotation within ~1 degree
        dr = np.asarray(r) @ r_true.T
        angle = np.degrees(np.arccos(np.clip((np.trace(dr) - 1) / 2, -1, 1)))
        assert angle < 1.5
        # translation direction within ~3 degrees
        cos_t = abs(float(np.dot(np.asarray(t), t_true)))
        assert cos_t > 0.995

    def test_outliers_rejected(self, two_view):
        intr, pts, wt1, wt2, uv1, uv2 = two_view
        rng = np.random.default_rng(1)
        uv2c = uv2.copy()
        uv2c[:60] = rng.uniform(0, 640, (60, 2))
        res = essential.find_essential(
            jax.random.PRNGKey(1), jnp.asarray(uv1), jnp.asarray(uv2c), intr,
            config=RansacConfig(max_iters=4096, batch=256, threshold=2e-5))
        mask = np.asarray(res.inlier_mask)
        assert mask[60:].sum() > 120
        assert mask[:60].sum() < 6


class TestPnP:
    def test_dlt_exact(self, two_view):
        intr, pts, wt1, wt2, uv1, uv2 = two_view
        uv_clean = np.array(camera.project_batch(jnp.asarray(wt2), intr,
                                                 jnp.asarray(pts)))
        wt = pnp.pnp_dlt(jnp.asarray(pts), jnp.asarray(uv_clean), intr)
        np.testing.assert_allclose(np.asarray(wt), wt2, atol=1e-3)

    def test_ransac_pnp_with_outliers(self, two_view):
        intr, pts, wt1, wt2, uv1, uv2 = two_view
        rng = np.random.default_rng(2)
        uv = uv2.copy()
        uv[:50] = rng.uniform(0, 640, (50, 2))
        res = pnp.solve_pnp(jax.random.PRNGKey(2), jnp.asarray(pts),
                            jnp.asarray(uv), intr,
                            config=RansacConfig(max_iters=2048, batch=128,
                                                threshold=4.0))
        assert int(res.num_inliers) > 120
        np.testing.assert_allclose(np.asarray(res.pose), wt2, atol=0.02)

    def test_pnp_translation_scale_observed(self, two_view):
        """Unlike the essential matrix, PnP recovers metric translation."""
        intr, pts, wt1, wt2, uv1, uv2 = two_view
        res = pnp.solve_pnp(jax.random.PRNGKey(3), jnp.asarray(pts),
                            jnp.asarray(uv2), intr)
        t = np.asarray(res.pose)[3:]
        np.testing.assert_allclose(np.linalg.norm(t),
                                   np.linalg.norm(wt2[3:]), rtol=0.05)
