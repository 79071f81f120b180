"""FAST / ORB / BRIEF feature tests vs scalar oracles + invariance checks."""
import numpy as np
import jax.numpy as jnp
import pytest

from compv_tpu.core.config import FastConfig, FastType, OrbConfig
from compv_tpu.features import brief, fast, orb
from compv_tpu.core.types import Points
from tests.reference import ref_ops


@pytest.fixture(scope="module")
def small_image(rng_mod):
    h, w = 64, 80
    yy, xx = np.mgrid[0:h, 0:w]
    img = 96.0 + 80.0 * ((xx // 10 + yy // 10) % 2) + rng_mod.normal(0, 6, (h, w))
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(123)


class TestFast:
    @pytest.mark.parametrize("n", [9, 12])
    def test_strengths_exact_vs_oracle(self, small_image, n):
        ours = np.asarray(fast.fast_strengths(jnp.asarray(small_image), 20, n))
        ref = ref_ops.fast_strengths(small_image, 20, n)
        np.testing.assert_array_equal(ours, ref)

    def test_nms_exact_vs_oracle(self, small_image):
        s = ref_ops.fast_strengths(small_image, 20, 9)
        ours = np.asarray(fast.fast_nms(jnp.asarray(s)))
        ref = ref_ops.fast_nms(s)
        np.testing.assert_array_equal(ours, ref)

    def test_detect_counts_match_oracle(self, small_image):
        ref_s = ref_ops.fast_nms(ref_ops.fast_strengths(small_image, 20, 9))
        expected = int((ref_s > 0).sum())
        pts = fast.fast_detect(jnp.asarray(small_image),
                               FastConfig(max_features=4096))
        assert int(pts.count) == expected

    def test_fast12_fewer_than_fast9(self, small_image):
        p9 = fast.fast_detect(jnp.asarray(small_image),
                              FastConfig(fast_type=FastType.FAST9, max_features=4096))
        p12 = fast.fast_detect(jnp.asarray(small_image),
                               FastConfig(fast_type=FastType.FAST12, max_features=4096))
        assert int(p12.count) <= int(p9.count)

    def test_flat_image_no_corners(self):
        img = np.full((32, 32), 100, np.uint8)
        pts = fast.fast_detect(jnp.asarray(img), FastConfig())
        assert int(pts.count) == 0

    def test_points_sorted_by_strength(self, small_image):
        pts = fast.fast_detect(jnp.asarray(small_image), FastConfig())
        s = np.asarray(pts.strength)
        n = int(pts.count)
        assert (np.diff(s[:n]) <= 0).all()


class TestBrief:
    def test_pattern_deterministic(self):
        a1, b1 = brief.brief_pattern(256, 31, 7, "gaussian")
        a2, b2 = brief.brief_pattern(256, 31, 7, "gaussian")
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_learned_pattern_table(self):
        """Learned table: 256 pairs, all offsets inside the 31x31 patch."""
        a, b = brief.brief_pattern(256, 31, pattern="learned")
        assert a.shape == (256, 2) and b.shape == (256, 2)
        assert np.abs(a).max() <= 15 and np.abs(b).max() <= 15
        assert not np.all(a == b, axis=1).any()

    def test_descriptor_shape_and_padding(self, small_image):
        pts = fast.fast_detect(jnp.asarray(small_image), FastConfig(max_features=64))
        d = brief.describe(jnp.asarray(small_image), pts)
        assert d.bits.shape == (64, 8)
        n = int(pts.count)
        assert (np.asarray(d.bits)[n:] == 0).all()

    def test_rotation_invariance_of_oriented_brief(self, small_image):
        """Descriptor at angle 0 vs angle pi must differ (pattern rotates),
        while identical angles give identical bits."""
        pts = fast.fast_detect(jnp.asarray(small_image), FastConfig(max_features=32))
        d0 = brief.describe(jnp.asarray(small_image), pts)
        rot = Points(xy=pts.xy, strength=pts.strength,
                     angle=pts.angle + np.pi, level=pts.level,
                     size=pts.size, count=pts.count)
        d1 = brief.describe(jnp.asarray(small_image), rot)
        n = int(pts.count)
        assert (np.asarray(d0.bits)[:n] != np.asarray(d1.bits)[:n]).any()
        d0b = brief.describe(jnp.asarray(small_image), pts)
        np.testing.assert_array_equal(np.asarray(d0.bits), np.asarray(d0b.bits))


    @pytest.mark.parametrize("diam,pattern", [(31, "learned"),
                                              (31, "gaussian"),
                                              (45, "gaussian"),
                                              (15, "gaussian")])
    def test_patch_method_bit_exact_vs_gather(self, small_image, diam,
                                              pattern):
        """The MXU patch-sampling backend must be BIT-identical to the
        gather backend (module docstring contract) at every patch
        diameter, including points whose rotated window hangs off the
        image border and centers OUTSIDE the image (both review-caught
        divergences: the window was sized for diameter 31 only, and a
        negative window start was silently clamped by dynamic_slice)."""
        img = jnp.asarray(small_image)
        h, w = small_image.shape
        rng = np.random.default_rng(11)
        n = 96
        xy = np.stack([rng.uniform(0, w - 1, n),
                       rng.uniform(0, h - 1, n)], 1).astype(np.float32)
        # force border cases: corners, edge midpoints, OFF-image centers
        xy[:12] = [[0, 0], [w - 1, 0], [0, h - 1], [w - 1, h - 1],
                   [w / 2, 0], [w / 2, h - 1], [0, h / 2], [w - 1, h / 2],
                   [-3, 40], [-6, 60], [80, -4], [w + 5, h + 2]]
        pts = Points(
            xy=jnp.asarray(xy),
            strength=jnp.ones((n,), jnp.float32),
            angle=jnp.asarray(rng.uniform(-np.pi, np.pi, n), jnp.float32),
            level=jnp.zeros((n,), jnp.int32),
            size=jnp.full((n,), 7.0, jnp.float32),
            count=jnp.asarray(n, jnp.int32))
        dg = brief.describe(img, pts, patch_diameter=diam, method="gather",
                            pattern=pattern)
        dp = brief.describe(img, pts, patch_diameter=diam, method="patch",
                            pattern=pattern)
        np.testing.assert_array_equal(np.asarray(dg.bits),
                                      np.asarray(dp.bits))


class TestOrb:
    def test_level_budgets_sum(self):
        budgets = orb.level_budgets(2000, 8, 0.83)
        assert abs(sum(budgets) - 2000) < len(budgets) + 1
        assert all(budgets[i] >= budgets[i + 1] for i in range(7))

    def test_detect_describe_end_to_end(self, small_image):
        pts, desc = orb.orb_detect_describe(jnp.asarray(small_image),
                                            OrbConfig(levels=4, max_features=256))
        n = int(pts.count)
        assert n > 10
        assert int(desc.count) == n
        xy = np.asarray(pts.xy)[:n]
        assert (xy[:, 0] < small_image.shape[1]).all()
        assert (xy[:, 1] < small_image.shape[0]).all()
        lv = np.asarray(pts.level)[:n]
        assert lv.max() >= 1  # multiple levels contribute

    def test_descriptors_follow_points_after_compaction(self, small_image):
        """A descriptor row must describe the point at the same index: match
        a frame against itself and require (near-)identity matching."""
        from compv_tpu.matchers import bruteforce
        pts, desc = orb.orb_detect_describe(jnp.asarray(small_image),
                                            OrbConfig(levels=3, max_features=128))
        m = bruteforce.match(desc, desc, knn=1)
        n = int(pts.count)
        ti = np.asarray(m.train_idx)[:n, 0]
        d = np.asarray(m.distance)[:n, 0]
        assert (d == 0).all()
        # self-distance 0 guaranteed; identical descriptors may alias, so
        # require >=90% exact index hits
        assert (ti == np.arange(n)).mean() > 0.9
