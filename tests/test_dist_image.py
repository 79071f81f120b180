"""Row-sharded image ops: seam-exact equality with single-chip programs
(8-device virtual CPU mesh; SURVEY §5 halo-exchange analogue)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from compv_tpu.features import fast
from compv_tpu.ops import convolve
from compv_tpu.parallel import dist_image, mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    return mesh_mod.make_mesh((8,), ("data",))


@pytest.fixture(scope="module")
def img(rng):
    h, w = 128, 160  # 128 rows = 16 per shard
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.clip(96 + 80 * ((xx // 8 + yy // 8) % 2)
                  + rng.normal(0, 8, (h, w)), 0, 255).astype(np.uint8)
    return jnp.asarray(out)


class TestShardedGradients:
    def test_matches_single_chip(self, img, mesh8):
        gx_s, gy_s = dist_image.gradients_sharded(img, mesh8)
        gx, gy = convolve.conv_separable(
            img, jnp.asarray(convolve.SOBEL3[0]),
            jnp.asarray(convolve.SOBEL3[1])), convolve.conv_separable(
            img, jnp.asarray(convolve.SOBEL3[1]),
            jnp.asarray(convolve.SOBEL3[0]))
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy),
                                   atol=1e-4)


class TestShardedBlur:
    def test_matches_single_chip(self, img, mesh8):
        got = dist_image.gaussian_blur_sharded(img, mesh8, 5, 2.0)
        k = jnp.asarray(convolve.gaussian_kernel1d(5, 2.0))
        want = convolve.conv_separable(img, k, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-3)


class TestShardedFast:
    def test_bit_equal_with_nms(self, img, mesh8):
        got = dist_image.fast_strengths_sharded(img, mesh8, 20, 9, nms=True)
        want = fast.fast_nms(fast.fast_strengths(img, 20, 9))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bit_equal_no_nms(self, img, mesh8):
        got = dist_image.fast_strengths_sharded(img, mesh8, 20, 9, nms=False)
        want = fast.fast_strengths(img, 20, 9)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestShardedFrontend:
    def test_fast_frames_matches_batch(self, mesh8, rng):
        from compv_tpu.parallel import dist_frontend
        from compv_tpu.features.fast import fast_detect_batch
        from compv_tpu.core.config import FastConfig
        imgs = jnp.asarray(rng.integers(0, 256, (8, 48, 64), np.uint8))
        cfg = FastConfig(threshold=20, max_features=32)
        got = dist_frontend.fast_detect_frames(imgs, mesh8, cfg)
        want = fast_detect_batch(imgs, cfg)
        np.testing.assert_array_equal(np.asarray(got.count),
                                      np.asarray(want.count))
        np.testing.assert_allclose(np.asarray(got.strength),
                                   np.asarray(want.strength))

    def test_orb_frames_shapes(self, mesh8, rng):
        from compv_tpu.parallel import dist_frontend
        from compv_tpu.core.config import OrbConfig
        imgs = jnp.asarray(rng.integers(0, 256, (8, 64, 80), np.uint8))
        p, d = dist_frontend.orb_frames(imgs, mesh8,
                                        OrbConfig(levels=2, max_features=32))
        assert p.xy.shape[0] == 8
        assert d.bits.shape[0] == 8
