"""Pin the device-side failure/validity convention (docs/API.md,
round-2 VERDICT item 9): the three canonical silent-garbage candidates —
CCL run-table overflow, RANSAC finding no model, Jacobi eigh on an
extreme-conditioned matrix — must each raise an IN-BAND, device-readable
flag instead of returning unlabelled garbage.

Reference analogue: COMPV_ERROR_CODE return threading
(base/include/compv/base/compv_errno.h) — impossible inside a traced XLA
program, hence the in-band convention.
"""
import jax
import jax.numpy as jnp
import numpy as np

from compv_tpu.features import ccl
from compv_tpu.geometry import linalg, ransac as ransac_mod
from compv_tpu.core.config import RansacConfig


class TestCclOverflow:
    def test_run_count_reports_true_count_on_overflow(self):
        """A vertical-stripe image has h*w/2 runs; extracting with a tiny
        max_runs must (a) still return, (b) report the TRUE run count so
        `run_count > max_runs` flags the truncation."""
        h, w = 32, 64
        img = (np.indices((h, w))[1] % 2).astype(np.uint8)  # w/2 runs/row
        labels = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(labels, max_components=8,
                                       max_runs=64)
        true_runs = h * (w // 2)
        assert int(comps.run_count) == true_runs
        assert int(comps.run_count) > 64  # overflow is visible
        # non-overflowing capacity agrees and is complete
        comps_ok = ccl.extract_components(labels, max_components=8,
                                          max_runs=4096)
        assert int(comps_ok.run_count) == true_runs

    def test_component_count_overflow_visible(self):
        """More components than max_components: `count` saturates at the
        slot capacity (the table really holds only that many), while
        `total_components` reports the TRUE pre-truncation number so
        `total_components > count` flags the drop."""
        h, w = 32, 64
        img = np.zeros((h, w), np.uint8)
        img[::2, ::2] = 1            # isolated pixels: (h/2)*(w/2) comps
        labels = ccl.label(jnp.asarray(img))
        comps = ccl.extract_components(labels, max_components=16,
                                       max_runs=4096)
        assert int(comps.count) == 16
        assert int(comps.total_components) == (h // 2) * (w // 2)
        assert int(comps.total_components) > int(comps.count)


class TestRansacNoModel:
    def test_found_false_on_pure_noise(self):
        """2-D line RANSAC on uniform noise with a tight threshold: no
        model reaches beyond-minimal support -> found must be False."""
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-100, 100, (64, 2)), jnp.float32)

        def build(sub):
            # line through 2 points as (a, b, c), degenerate -> NaN
            d = sub[1] - sub[0]
            n = jnp.stack([-d[1], d[0]])
            n = n / jnp.linalg.norm(n)          # NaN when coincident
            c = -jnp.dot(n, sub[0])
            return jnp.concatenate([n, c[None]])

        def resid(model, data):
            return (data @ model[:2] + model[2]) ** 2

        res = ransac_mod.ransac(
            jax.random.PRNGKey(0), pts, build, resid, sample_size=2,
            config=RansacConfig(threshold=1e-8, max_iters=64, batch=32))
        assert not bool(res.found)

    def test_found_true_on_real_structure(self):
        rng = np.random.default_rng(4)
        xs = rng.uniform(-50, 50, 64)
        pts = np.stack([xs, 0.5 * xs + 3.0], 1)
        pts[::8] += rng.uniform(-40, 40, (8, 2))   # outliers

        def build(sub):
            d = sub[1] - sub[0]
            n = jnp.stack([-d[1], d[0]])
            n = n / jnp.linalg.norm(n)
            c = -jnp.dot(n, sub[0])
            return jnp.concatenate([n, c[None]])

        def resid(model, data):
            return (data @ model[:2] + model[2]) ** 2

        res = ransac_mod.ransac(
            jax.random.PRNGKey(0), jnp.asarray(pts, jnp.float32),
            build, resid, sample_size=2,
            config=RansacConfig(threshold=0.25, max_iters=256, batch=32))
        assert bool(res.found)
        assert int(res.num_inliers) >= 48


class TestEighConvergence:
    def test_converged_on_wellconditioned(self):
        rng = np.random.default_rng(5)
        a = rng.normal(size=(9, 9)).astype(np.float32)
        s = jnp.asarray(a @ a.T + np.eye(9, dtype=np.float32))
        w, v = linalg.eigh_jacobi(s)
        assert bool(linalg.eigh_converged(s, w, v))

    def test_flags_bogus_decomposition(self):
        """A wrong (w, v) pair must fail the residual check — proves the
        check actually measures the decomposition, not a tautology."""
        rng = np.random.default_rng(6)
        a = rng.normal(size=(9, 9)).astype(np.float32)
        s = jnp.asarray(a @ a.T + np.eye(9, dtype=np.float32))
        w, v = linalg.eigh_jacobi(s)
        w_bad = w + jnp.max(jnp.abs(w))        # shift all eigenvalues
        assert not bool(linalg.eigh_converged(s, w_bad, v))

    def test_insufficient_sweeps_detected(self):
        """One sweep on a matrix that needs several: residual check must
        catch the unconverged result; default sweeps must pass it."""
        rng = np.random.default_rng(7)
        a = rng.normal(size=(9, 9)).astype(np.float32)
        # spread of eigenvalue magnitudes slows cyclic Jacobi
        d = np.diag(np.logspace(0, 5, 9).astype(np.float32))
        q, _ = np.linalg.qr(a)
        s = jnp.asarray((q @ d @ q.T).astype(np.float32))
        w1, v1 = linalg.eigh_jacobi(s, sweeps=1)
        w10, v10 = linalg.eigh_jacobi(s, sweeps=10)
        assert bool(linalg.eigh_converged(s, w10, v10))
        assert not bool(linalg.eigh_converged(s, w1, v1, tol=1e-6))
