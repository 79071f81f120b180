"""Tracing utility + misc op tests (gamma)."""
import numpy as np
import jax.numpy as jnp

from compv_tpu.core import trace
from compv_tpu.ops import histogram


class TestTrace:
    def test_span_and_report(self):
        trace.reset()
        with trace.span("op_a"):
            _ = jnp.sum(jnp.arange(100))
        with trace.span("op_a"):
            pass
        with trace.span("op_b"):
            pass
        rows = trace.table()
        names = {r[0]: r for r in rows}
        assert names["op_a"][1] == 2
        assert names["op_b"][1] == 1
        assert "op_a" in trace.report()
        trace.reset()
        assert trace.table() == []


class TestGamma:
    def test_identity(self, rng):
        img = jnp.asarray(rng.integers(0, 256, (16, 16), np.uint8))
        out = histogram.gamma_correct(img, 1.0)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(img))

    def test_matches_numpy(self, rng):
        img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
        out = histogram.gamma_correct(jnp.asarray(img), 0.5)
        want = np.clip(np.round(255.0 * (img / 255.0) ** 0.5), 0, 255)
        np.testing.assert_allclose(np.asarray(out), want, atol=1)


class TestBits:
    def test_ops_match_numpy(self, rng):
        import jax
        from compv_tpu.ops import bits
        a = jnp.asarray(rng.integers(0, 256, (16, 16), np.uint8))
        b = jnp.asarray(rng.integers(0, 256, (16, 16), np.uint8))
        np.testing.assert_array_equal(np.asarray(bits.bits_and(a, b)),
                                      np.asarray(a) & np.asarray(b))
        np.testing.assert_array_equal(np.asarray(bits.bits_not_and(a, b)),
                                      (~np.asarray(a)) & np.asarray(b))
        np.testing.assert_array_equal(
            np.asarray(bits.popcount(a)),
            np.unpackbits(np.asarray(a)[..., None], axis=2).sum(2))

    def test_popcount_total(self):
        from compv_tpu.ops import bits
        a = jnp.asarray([0b1011, 0b1, 0], jnp.uint32)
        assert int(bits.popcount_total(a)) == 4


class TestFlann:
    def test_delegates_to_bruteforce(self, rng):
        from compv_tpu.matchers import flann
        from compv_tpu.core.types import Descriptors
        b = jnp.asarray(rng.integers(0, 2**32, (8, 8), dtype=np.uint64)
                        .astype(np.uint32))
        d = Descriptors(bits=b, count=jnp.asarray(8, jnp.int32))
        m = flann.match(d, d, knn=2)
        assert (np.asarray(m.distance)[:, 0] == 0).all()


class TestImageCrop:
    def test_crop_packed(self, rng):
        from compv_tpu.core.types import Image, PixelFormat
        arr = jnp.asarray(rng.integers(0, 256, (40, 60), np.uint8))
        img = Image.from_array(arr, PixelFormat.GRAY8)
        c = img.crop(10, 5, 20, 16)
        assert c.plane().shape == (16, 20)
        np.testing.assert_array_equal(np.asarray(c.plane()),
                                      np.asarray(arr)[5:21, 10:30])

    def test_crop_subsampled(self, rng):
        from compv_tpu.core.types import Image, PixelFormat
        y = jnp.asarray(rng.integers(0, 256, (48, 64), np.uint8))
        u = jnp.asarray(rng.integers(0, 256, (24, 32), np.uint8))
        v = jnp.asarray(rng.integers(0, 256, (24, 32), np.uint8))
        img = Image(planes=(y, u, v), fmt=PixelFormat.YUV420P)
        c = img.crop(16, 8, 32, 24)
        assert c.plane(0).shape == (24, 32)
        assert c.plane(1).shape == (12, 16)


class TestKhtGsFilter:
    def test_mask(self):
        from compv_tpu.features.hough_kht import filter_lines_by_gs
        from compv_tpu.features.hough_sht import HoughLines
        lines = HoughLines(rho=jnp.zeros(4), theta=jnp.zeros(4),
                           strength=jnp.asarray([100, 5, 60, 0]),
                           count=jnp.asarray(3))
        mask = np.asarray(filter_lines_by_gs(lines, gs=100.0, frac=0.5))
        assert list(mask) == [True, False, True, False]


class TestDeviceInfo:
    def test_capability_report(self):
        from compv_tpu.core.device import capability_report, device_info
        rep = capability_report()
        assert "backend:" in rep and "devices:" in rep
        infos = device_info()
        assert len(infos) >= 1 and "platform" in infos[0]
