"""Extra linalg/calib parity tests (invD, colinearity, undistort image)."""
import numpy as np
import jax.numpy as jnp

from compv_tpu.geometry import linalg, calib
from compv_tpu.slam.camera import Intrinsics


class TestLinalgExtras:
    def test_inv_diag(self):
        a = jnp.diag(jnp.asarray([2.0, 4.0, 0.5]))
        inv = linalg.inv_diag(a)
        np.testing.assert_allclose(np.asarray(inv),
                                   np.diag([0.5, 0.25, 2.0]), atol=1e-6)

    def test_colinear_2d(self):
        x = np.linspace(0, 9, 10)
        line = jnp.asarray(np.stack([x, 2 * x + 1], 1), jnp.float32)
        assert bool(linalg.is_colinear_2d(line))
        spread = line.at[3, 1].add(5.0)
        assert not bool(linalg.is_colinear_2d(spread))

    def test_colinear_3d(self):
        t = np.linspace(0, 5, 8)
        line = jnp.asarray(np.stack([t, 2 * t, -t], 1), jnp.float32)
        assert bool(linalg.is_colinear_3d(line))
        spread = line.at[2, 2].add(3.0)
        assert not bool(linalg.is_colinear_3d(spread))


class TestUndistortImage:
    def test_zero_distortion_identity(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (48, 64), np.uint8))
        intr = Intrinsics.make(50.0, 50.0, 32.0, 24.0)
        out = calib.undistort_image(img, intr)
        # zero k1/k2: output equals input away from borders
        np.testing.assert_allclose(np.asarray(out)[2:-2, 2:-2],
                                   np.asarray(img)[2:-2, 2:-2], atol=1.01)
