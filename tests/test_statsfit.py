"""Robust line/parabola fitting tests (reference tests/math drive
CompVMathStatsFit with outlier-contaminated samples)."""
import numpy as np
import jax
import jax.numpy as jnp

from compv_tpu.geometry import statsfit
from compv_tpu.core.config import RansacConfig
from compv_tpu.ops import mathutils


class TestLineFit:
    def test_tls_exact(self):
        # y = 2x + 1 exactly
        x = np.linspace(0, 10, 20)
        pts = jnp.asarray(np.stack([x, 2 * x + 1], 1), jnp.float32)
        line = statsfit.line_fit_tls(pts)
        d = statsfit.line_distance(line, pts)
        assert float(jnp.max(d)) < 1e-3

    def test_vertical_line(self):
        y = np.linspace(0, 5, 10)
        pts = jnp.asarray(np.stack([np.full_like(y, 3.0), y], 1))
        line = statsfit.line_fit_tls(pts)
        d = statsfit.line_distance(line, pts)
        assert float(jnp.max(d)) < 1e-4

    def test_ransac_rejects_outliers(self, rng):
        x = np.linspace(0, 100, 80)
        y = 0.5 * x - 7 + rng.normal(0, 0.5, 80)
        pts = np.stack([x, y], 1)
        out = rng.uniform(0, 100, (20, 2))  # 20% gross outliers
        allp = jnp.asarray(np.concatenate([pts, out]), jnp.float32)
        res = statsfit.fit_line_ransac(
            jax.random.PRNGKey(0), allp,
            config=RansacConfig(threshold=4.0, max_iters=256, batch=64))
        assert int(res.num_inliers) >= 75
        d = statsfit.line_distance(res.model, jnp.asarray(pts, jnp.float32))
        assert float(jnp.mean(d)) < 2.0


class TestParabolaFit:
    def test_exact(self):
        x = np.linspace(-5, 5, 30)
        pts = jnp.asarray(np.stack([x, 2 * x ** 2 - 3 * x + 1], 1), jnp.float32)
        coef = statsfit.parabola_fit(pts)
        np.testing.assert_allclose(np.asarray(coef), [2, -3, 1], atol=1e-2)

    def test_sideways(self):
        y = np.linspace(-5, 5, 30)
        pts = jnp.asarray(np.stack([0.5 * y ** 2 + y - 2, y], 1), jnp.float32)
        coef = statsfit.parabola_fit(pts, sideways=True)
        np.testing.assert_allclose(np.asarray(coef), [0.5, 1, -2], atol=1e-2)

    def test_ransac_with_outliers(self, rng):
        x = np.linspace(-10, 10, 80)
        y = 0.3 * x ** 2 + x + 2 + rng.normal(0, 0.3, 80)
        pts = np.stack([x, y], 1)
        out = rng.uniform(-10, 40, (20, 2))
        allp = jnp.asarray(np.concatenate([pts, out]), jnp.float32)
        res = statsfit.fit_parabola_ransac(
            jax.random.PRNGKey(1), allp,
            config=RansacConfig(threshold=4.0, max_iters=256, batch=64))
        assert int(res.num_inliers) >= 70
        np.testing.assert_allclose(np.asarray(res.model), [0.3, 1, 2],
                                   atol=0.3)


class TestNorms:
    def test_norm_l2(self, rng):
        x = jnp.asarray(rng.normal(size=(17,)), jnp.float32)
        n = mathutils.norm_l2(x)
        assert abs(float(jnp.linalg.norm(n)) - 1.0) < 1e-5

    def test_norm_minmax(self, rng):
        x = jnp.asarray(rng.normal(size=(40,)) * 7 + 3, jnp.float32)
        n = mathutils.norm_minmax(x)
        assert float(jnp.min(n)) == 0.0 and abs(float(jnp.max(n)) - 1) < 1e-6

    def test_norm_zscore(self, rng):
        x = jnp.asarray(rng.normal(size=(50,)) * 4 - 2, jnp.float32)
        n = mathutils.norm_zscore(x)
        assert abs(float(jnp.mean(n))) < 1e-5
        assert abs(float(mathutils.stdev(n)) - 1.0) < 1e-4
