"""Edge detection tests: Sobel/Scharr/Prewitt + Canny."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.features import canny as canny_mod
from compv_tpu.features import edges
from compv_tpu.core.config import CannyConfig


@pytest.fixture(scope="module")
def square_image():
    """Black frame with one bright square: known edge geometry."""
    img = np.zeros((64, 64), np.uint8)
    img[16:48, 16:48] = 200
    return img


class TestEdgeDetect:
    @pytest.mark.parametrize("kind", ["sobel", "scharr", "prewitt"])
    def test_edges_on_square(self, square_image, kind):
        out = np.asarray(edges.edge_detect(jnp.asarray(square_image), kind))
        assert out.max() == 255  # scaled to full range
        # strongest responses on the square's border rows/cols
        assert out[16, 30] > 100 and out[30, 16] > 100
        assert out[32, 32] == 0  # flat interior

    def test_sobel_gmax_value(self, square_image):
        _, _, gmax = edges.edge_gradients_max(jnp.asarray(square_image), "sobel")
        # step edge of height 200: |gx| = 200*4 = 800 at the edge, corners add
        assert float(gmax) == 1200.0  # corner: |gx|+|gy| = 600+600


class TestCanny:
    def test_square_outline(self, square_image):
        out = np.asarray(canny_mod.canny(jnp.asarray(square_image),
                                         CannyConfig(low=59, high=119)))
        assert set(np.unique(out)) <= {0, 255}
        on = out > 0
        # edges form a connected ring around the square: expect roughly the
        # perimeter 4*32 pixels, allow NMS thinning variance
        assert 80 <= on.sum() <= 300
        # no edges deep inside or far outside
        assert not on[28:36, 28:36].any()
        assert not on[:8, :8].any()

    def test_flat_image_no_edges(self):
        img = np.full((32, 32), 77, np.uint8)
        out = np.asarray(canny_mod.canny(jnp.asarray(img), CannyConfig()))
        assert out.sum() == 0

    def test_hysteresis_connects_weak_chain(self):
        """A weak chain touching a strong seed must be kept in full."""
        mag = np.zeros((16, 16), np.float32)
        mag[8, 2] = 200.0            # strong seed
        mag[8, 3:12] = 80.0          # weak chain (> low, < high)
        out = np.asarray(canny_mod.hysteresis(jnp.asarray(mag), 59.0, 119.0))
        assert out[8, 2:12].all()
        # isolated weak pixel elsewhere must be dropped
        mag2 = mag.copy()
        mag2[2, 12] = 80.0
        out2 = np.asarray(canny_mod.hysteresis(jnp.asarray(mag2), 59.0, 119.0))
        assert not out2[2, 12]

    def test_threshold_from_mean(self, square_image):
        lo, hi = canny_mod.threshold_from_mean(jnp.asarray(square_image))
        assert float(lo) < float(hi)
        out = np.asarray(canny_mod.canny(jnp.asarray(square_image),
                                         CannyConfig(low=float(lo), high=float(hi))))
        assert (out > 0).sum() > 50
